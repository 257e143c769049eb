"""astropy.io.fits facade over origin_tpu.fitsio (test stub)."""

from origin_tpu import fitsio as _f

Header = _f.Header
getdata = _f.getdata
getheader = _f.getheader
writeto = _f.writeto


class HDUList(list):
    """List of HDUs usable as a context manager (fits.open contract)."""

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def writeto(self, filename, overwrite=True, **kwargs):
        _f.write(filename, list(self), overwrite=overwrite)


def open(filename, **kwargs):  # noqa: A001 - astropy's name
    return HDUList(_f.read(filename))


def PrimaryHDU(data=None, header=None):
    return _f.HDU(data=data, header=header)


def ImageHDU(data=None, header=None, name=None):
    return _f.HDU(data=data, header=header, name=name)


def BinTableHDU(data=None, header=None, name=None):
    return _f.HDU(data=data, header=header, name=name)
