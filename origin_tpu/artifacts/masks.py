"""Source and sky mask generation.

Host-side reimplementation of reference source_masks.py and
lib_origin.py:2225-2372 (`create_masks`): per source, segment the max-image
of the detection cube around each line, OR in an FWHM-scaled disc, grow the
mask size (x1.5, up to 4 retries) when the source touches the cutout edge or
leaves too few sky pixels, then trim back to the smallest valid size.
"""

from __future__ import annotations

import logging

import numpy as np

from ..core.containers import Image
from ..detect.segmentation import detect_sources

__all__ = ["gen_source_mask", "create_masks"]

logger = logging.getLogger(__name__)


def _touches_edge(arr):
    return bool(
        np.any(arr[0, :]) or np.any(arr[-1, :]) or np.any(arr[:, 0])
        or np.any(arr[:, -1])
    )


def _trimmed(arr, border):
    return arr[border:-border, border:-border]


def _create_mask(
    source_id,
    x,
    y,
    lines,
    detection_cube,
    threshold,
    cont_sky,
    fwhm,
    out_dir,
    *,
    mask_size=25,
    seg_npixel=5,
    min_sky_pixels=100,
    fwhm_factor=2,
    verbose=False,
    step=1,
):
    """Build the (possibly enlarged) source mask and sky mask.

    ``x``/``y`` are the source position in pixels; lines must provide
    ra/dec (deg), z, fwhm and num_line columns.  Returns
    (source_mask bool, sky_mask int, wcs) on the final cutout grid.
    """
    mask_size = int(mask_size)
    if mask_size % 2 == 0:
        logger.debug("Mask size must be odd; using %d", mask_size + 1)
        mask_size += 1

    is_wrong = False
    sub_cube = detection_cube.subcube(center=(y, x), size=mask_size)
    sky = cont_sky.subimage(center=(y, x), size=mask_size)
    sky_mask = np.where(sky.mask, 0, sky.data).astype(int) if sky.mask is not None \
        else sky.data.astype(int)

    source_mask = np.zeros((mask_size, mask_size), dtype=bool)

    pix = sub_cube.wcs.sky2pix(
        np.stack([np.asarray(lines["dec"]), np.asarray(lines["ra"])], axis=1)
    )
    lines_y, lines_x = pix[:, 0], pix[:, 1]

    for x_line, y_line, z_line, fwhm_line, num_line in zip(
        lines_x, lines_y, np.asarray(lines["z"], dtype=int),
        np.asarray(lines["fwhm"]), np.asarray(lines["num_line"]),
    ):
        min_z = int(z_line - fwhm_line)
        max_z = int(z_line + fwhm_line)
        max_map = sub_cube.get_image(wave=(min_z, max_z), method="max")

        # invalid pixels of THIS line's max image (reference max_map.mask),
        # not the mask of an arbitrary spectral plane
        segmap = detect_sources(
            max_map.data, threshold, seg_npixel, mask=max_map.mask
        )

        xi, yi = int(np.round(x_line)), int(np.round(y_line))
        if not (0 <= yi < mask_size and 0 <= xi < mask_size):
            is_wrong = True
            logger.error(
                "The line %d associated to source %d is too far from the "
                "source position given the mask size (%d).",
                num_line, source_id, mask_size,
            )
            break
        seg_line = 0 if segmap is None else int(segmap[yi, xi])
        line_mask = (
            segmap == seg_line if seg_line != 0
            else np.zeros((mask_size, mask_size), dtype=bool)
        )

        radius = int(np.ceil(0.5 * fwhm_factor * fwhm[z_line]))
        yy, xx = np.mgrid[:mask_size, :mask_size]
        line_mask = line_mask | (
            ((xx - xi) ** 2 + (yy - yi) ** 2) <= radius ** 2
        )
        if verbose:
            max_map.write(
                f"{out_dir}/S{source_id}_L{num_line}_step{step}_cor.fits"
            )
        source_mask |= line_mask

    sky_mask[source_mask] = 0

    is_wrong |= (
        _touches_edge(source_mask)
        or int(np.sum(sky_mask == 1)) < min_sky_pixels
    )

    if is_wrong and step <= 4:
        new_size = int(mask_size * 1.5)
        logger.debug(
            "Source %s mask can't be done with size %s px at step %s. "
            "Trying with %s px.", source_id, mask_size, step, new_size,
        )
        return _create_mask(
            source_id, x, y, lines, detection_cube, threshold, cont_sky,
            fwhm, out_dir, mask_size=new_size, seg_npixel=seg_npixel,
            min_sky_pixels=min_sky_pixels, fwhm_factor=fwhm_factor,
            verbose=verbose, step=step + 1,
        )
    if is_wrong:
        logger.error(
            "Source %s mask couldn't be done after %s attempts with a mask "
            "size up to %s.", source_id, step, mask_size,
        )
    return source_mask, sky_mask, sub_cube.wcs


def _trim_masks(source_mask, sky_mask, min_size, min_sky_npixels):
    """Shrink the masks to the smallest size keeping all constraints."""
    initial = len(source_mask)
    border = 1
    while (
        initial - 2 * border >= min_size
        and not _touches_edge(_trimmed(source_mask, border))
        and int(np.sum(_trimmed(sky_mask, border) == 1)) >= min_sky_npixels
    ):
        border += 1
    border -= 1
    if border > 1:
        source_mask = _trimmed(source_mask, border)
        sky_mask = _trimmed(sky_mask, border)
    touch = _touches_edge(source_mask)
    not_enough_sky = int(np.sum(sky_mask == 1)) < min_sky_npixels
    return source_mask, sky_mask, border if border > 1 else 0, touch, not_enough_sky


def gen_source_mask(
    source_id,
    x,
    y,
    lines,
    detection_cube,
    threshold,
    cont_sky,
    fwhm,
    out_dir,
    *,
    mask_size=25,
    seg_npixel=5,
    min_sky_npixels=100,
    fwhm_factor=2,
    verbose=False,
):
    """Generate and write the source mask + sky mask FITS of one source.

    Returns source_id when the mask is problematic (touches the edge or has
    too few sky pixels after all retries), else None.
    (Reference source_masks.py:281-401.)
    """
    source_mask, sky_mask, wcs = _create_mask(
        source_id, x, y, lines, detection_cube, threshold, cont_sky, fwhm,
        out_dir, mask_size=mask_size, seg_npixel=seg_npixel,
        min_sky_pixels=min_sky_npixels, fwhm_factor=fwhm_factor,
        verbose=verbose,
    )
    source_mask, sky_mask, border, touch, not_enough_sky = _trim_masks(
        source_mask, sky_mask, min_size=mask_size,
        min_sky_npixels=min_sky_npixels,
    )
    if touch:
        logger.error(
            "Mask creation problem: the source %s touches the edge of the "
            "mask.", source_id,
        )
    if not_enough_sky:
        logger.error(
            "Mask creation problem: the source %s has not enough sky "
            "pixels.", source_id,
        )
    if border:
        wcs = wcs[border:-border, border:-border]

    Image(data=source_mask.astype(np.int64), wcs=wcs).write(
        f"{out_dir}/source-mask-%0.5d.fits" % source_id
    )
    Image(data=sky_mask.astype(np.int64), wcs=wcs).write(
        f"{out_dir}/sky-mask-%0.5d.fits" % source_id
    )
    if touch or not_enough_sky:
        return source_id


def create_masks(
    line_table,
    source_table,
    profile_fwhm,
    cube_correl,
    threshold_correl,
    cube_std,
    threshold_std,
    segmap,
    fwhm,
    out_dir,
    *,
    mask_size=25,
    min_sky_npixels=100,
    seg_thres_factor=0.5,
    fwhm_factor=2,
    plot_problems=True,
):
    """Create the source and sky masks of every source.

    Primary (comp=0) sources segment the correlation cube; complementary
    (comp=1) sources segment the std cube, each at ``threshold *
    seg_thres_factor``.  (Reference lib_origin.py:2225-2372.)
    """
    line_table = line_table.copy()
    # segmentation at the raw detection position (x0/y0/z0), not the refined
    # one, which may fall outside the segment
    sky = cube_correl.wcs.pix2sky(
        np.stack(
            [np.asarray(line_table["y0"], float),
             np.asarray(line_table["x0"], float)], axis=1,
        )
    )
    line_table["dec"] = sky[:, 0]
    line_table["ra"] = sky[:, 1]
    line_table["z"] = np.asarray(line_table["z0"])
    line_table["fwhm"] = np.asarray(
        [profile_fwhm[p] for p in np.asarray(line_table["profile"], int)]
    )

    skymap = Image(
        data=(np.asarray(segmap.data) == 0).astype(int), wcs=segmap.wcs,
        copy=False,
    )

    src_by_id = {int(i): k for k, i in enumerate(np.asarray(source_table["ID"]))}
    grouped = line_table.group_by("ID")
    from ..utils import progressbar

    for group in progressbar(grouped.groups, desc="masks",
                             total=len(grouped.groups), leave=False):
        source_id = int(group["ID"][0])
        k = src_by_id[source_id]
        source_x = float(np.asarray(source_table["x"])[k])
        source_y = float(np.asarray(source_table["y"])[k])
        logger.debug("Making mask of source %s.", source_id)

        if int(np.asarray(source_table["comp"])[k]) == 0:
            detection_cube = cube_correl
            threshold = threshold_correl * seg_thres_factor
        else:
            detection_cube = cube_std
            threshold = threshold_std * seg_thres_factor

        ret = gen_source_mask(
            source_id, source_x, source_y, lines=group,
            detection_cube=detection_cube, threshold=threshold,
            cont_sky=skymap, fwhm=fwhm, out_dir=out_dir,
            mask_size=mask_size, min_sky_npixels=min_sky_npixels,
            fwhm_factor=fwhm_factor,
        )
        if ret is not None:
            logger.warning(
                "The source %s mask is problematic. You may want to check "
                "source-mask-%0.5d.fits", ret, ret,
            )
            with open(f"{out_dir}/problematic_masks.txt", "a") as out:
                out.write(f"{ret}\n")
            if plot_problems:
                gen_source_mask(
                    source_id, source_x, source_y, lines=group,
                    detection_cube=detection_cube, threshold=threshold,
                    cont_sky=skymap, fwhm=fwhm, out_dir=out_dir,
                    mask_size=mask_size, min_sky_npixels=min_sky_npixels,
                    fwhm_factor=fwhm_factor, verbose=True,
                )
