class AstropyUserWarning(Warning):
    pass


class AstropyWarning(Warning):
    pass
