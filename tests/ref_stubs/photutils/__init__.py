def detect_sources(*args, **kwargs):
    raise NotImplementedError("photutils stub: detection unavailable")
