class VerifyWarning(Warning):
    pass
