import numpy as np

gaussian_sigma_to_fwhm = 2.0 * np.sqrt(2.0 * np.log(2.0))
gaussian_fwhm_to_sigma = 1.0 / gaussian_sigma_to_fwhm


def sigma_clip(*args, **kwargs):
    raise NotImplementedError("astropy stub: sigma_clip unavailable")


def sigma_clipped_stats(*args, **kwargs):
    raise NotImplementedError("astropy stub: stats unavailable")
