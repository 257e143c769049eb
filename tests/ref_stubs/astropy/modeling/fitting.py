class LevMarLSQFitter:
    """Import-time stub; the session-load path never fits models."""

    def __call__(self, *args, **kwargs):
        raise NotImplementedError("astropy stub: model fitting unavailable")
