class lazyproperty:
    """Non-data descriptor caching the first computed value (the astropy
    contract the reference relies on for ``profiles`` / ``cube_raw``)."""

    def __init__(self, fget):
        self.fget = fget
        self.__doc__ = fget.__doc__
        self.name = fget.__name__

    def __get__(self, obj, owner=None):
        if obj is None:
            return self
        val = self.fget(obj)
        obj.__dict__[self.name] = val
        return val
