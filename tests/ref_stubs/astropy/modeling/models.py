class Gaussian1D:
    """Import-time stub; the session-load path never builds models."""

    def __init__(self, *args, **kwargs):
        raise NotImplementedError("astropy stub: models unavailable")
