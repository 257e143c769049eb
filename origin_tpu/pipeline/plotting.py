"""Diagnostic plots for ORIGIN sessions (reference origin.py:729-1262)."""

from __future__ import annotations

import warnings

import numpy as np

__all__ = ["PlotMixin"]


class PlotMixin:
    """Matplotlib diagnostics mixed into the ORIGIN session object."""

    def plot_areas(self, ax=None, **kwargs):
        """Show the PCA area map."""
        import matplotlib.pyplot as plt

        if ax is None:
            ax = plt.gca()
        kwargs.setdefault("cmap", "jet")
        kwargs.setdefault("alpha", 0.7)
        kwargs.setdefault("interpolation", "nearest")
        kwargs["origin"] = "lower"
        cax = ax.imshow(self.areamap.data, **kwargs)
        i0, i1 = np.min(self.areamap.data), np.max(self.areamap.data)
        if i0 != i1:
            plt.colorbar(cax, ax=ax)
        return ax

    def plot_step03_PCA_threshold(self, log10=False, ncol=3, legend=True,
                                  xlim=None, fig=None, **fig_kw):
        """Histogram + threshold of the O2 test per area."""
        import matplotlib.pyplot as plt

        if self.nbAreas is None:
            raise ValueError("Run the step 02 to initialize self.nbAreas")
        if fig is None:
            fig = plt.figure()
        n = max(1, int(np.ceil(self.nbAreas / ncol)))
        m = min(self.nbAreas, ncol)
        for area in range(1, self.nbAreas + 1):
            ax = fig.add_subplot(n, m, area, **fig_kw)
            self.plot_PCA_threshold(area, "step03", log10, legend, xlim, ax)
        fig.subplots_adjust(wspace=0)
        return fig

    def plot_step03_PCA_stat(self, cutoff=5, ax=None):
        """Per-area PCA threshold with MAD outlier flagging."""
        import matplotlib.pyplot as plt

        if self.nbAreas is None:
            raise ValueError("Run the step 02 to initialize self.nbAreas")
        if self.thresO2 is None:
            raise ValueError("Run the step 03 to compute the threshold values")
        if ax is None:
            ax = plt.gca()
        thres = np.asarray(self.thresO2)
        ax.plot(np.arange(1, self.nbAreas + 1), thres, "+")
        med = np.median(thres)
        diff = np.absolute(thres - med)
        mad = np.median(diff)
        if mad != 0:
            ksel = (diff / mad) > cutoff
            if ksel.any():
                ax.plot(np.arange(1, self.nbAreas + 1)[ksel], thres[ksel], "ro")
        ax.set_xlabel("area")
        ax.set_ylabel("Threshold")
        ax.set_title(f"PCA threshold (med={med:.2f}, mad= {mad:.2f})")
        return ax

    def plot_PCA_threshold(self, area, pfa_test="step03", log10=False,
                           legend=True, xlim=None, ax=None):
        """O2 histogram, Gaussian fit and threshold for one area."""
        import matplotlib.pyplot as plt
        from scipy import stats

        if self.nbAreas is None:
            raise ValueError("Run the step 02 to initialize self.nbAreas")

        if pfa_test == "step03":
            param = self.param["compute_PCA_threshold"]["params"]
            if "pfa_test" not in param:
                raise ValueError(
                    "pfa_test param is None: set a value or run the Step03"
                )
            pfa_test = param["pfa_test"]
            hist = self.histO2[area - 1]
            bins = self.binO2[area - 1]
            thre = np.asarray(self.thresO2)[area - 1]
            mea = np.asarray(self.meaO2)[area - 1]
            std = np.asarray(self.stdO2)[area - 1]
        else:
            if self.cube_std is None:
                raise ValueError("Run the step 01 to initialize self.cube_std")
            from ..ops import compute_pca_threshold

            sel = self.areamap.data == area
            _, hist, bins, thre, mea, std = compute_pca_threshold(
                self.cube_std.data[:, sel], pfa_test
            )

        if ax is None:
            ax = plt.gca()
        center = (bins[:-1] + bins[1:]) / 2
        gauss = stats.norm.pdf(center, loc=mea, scale=std)
        gauss *= hist.max() / gauss.max()
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            if log10:
                gauss = np.log10(gauss)
                hist = np.log10(hist)
        ax.plot(center, hist, "-k")
        ax.plot(center, hist, ".r")
        ax.plot(center, gauss, "-b", alpha=0.5)
        ax.axvline(thre, color="b", lw=2, alpha=0.5)
        ax.grid()
        if xlim is not None:
            ax.set_xlim(xlim)
        ax.set_xlabel("frequency")
        ax.set_ylabel("value")
        if legend:
            ax.text(
                0.1, 0.8, "zone %d\npfa %.2f\nthreshold %.2f" % (
                    area, pfa_test, thre),
                transform=ax.transAxes,
                bbox=dict(facecolor="red", alpha=0.5),
            )
        return ax

    def plot_mapPCA(self, area=None, iteration=None, ax=None, **kwargs):
        """Show the per-spaxel greedy PCA iteration counts."""
        import matplotlib.pyplot as plt

        if self.mapO2 is None:
            raise ValueError("Run the step 04 to initialize self.mapO2")
        themap = np.array(self.mapO2.data, dtype=float)
        title = "Number of times the spaxel got cleaned by the PCA"
        if iteration is not None:
            title += "\n%d iterations" % iteration
            themap[themap < iteration] = np.nan
        if area is not None:
            themap[self.areamap.data != area] = np.nan
            title += " (zone %d)" % area
        if ax is None:
            ax = plt.gca()
        kwargs.setdefault("cmap", "jet")
        kwargs.setdefault("origin", "lower")
        im = ax.imshow(themap, **kwargs)
        ax.set_title(title)
        plt.colorbar(im, ax=ax)
        return ax

    def plot_purity(self, comp=False, ax=None, log10=False, legend=True):
        """Purity and detection counts per threshold (step06)."""
        import matplotlib.pyplot as plt

        if ax is None:
            ax = plt.gca()
        if comp:
            threshold = self.threshold_std
            purity = self.param["purity_std"]
            pval = self.Pval_comp
        else:
            threshold = self.threshold_correl
            purity = self.param["purity"]
            pval = self.Pval
        if pval is None:
            raise ValueError("Run the step 06")
        tval = np.asarray(pval["Tval_r"])
        ax2 = ax.twinx()
        ax2.plot(tval, pval["Pval_r"], "y.-", label="purity")
        ax.plot(tval, pval["Det_M"], "b.-", label="n detections (+DATA)")
        ax.plot(tval, pval["Det_m"], "g.-", label="n detections (-DATA)")
        ax2.plot(threshold, purity, "xr")
        if log10:
            ax.set_yscale("log")
            ax2.set_yscale("log")
        ax.axvline(threshold, color="r", alpha=0.25, lw=2,
                   label="automatic threshold")
        ax.set_xlabel("Threshold")
        ax2.set_ylabel("Purity")
        ax.set_ylabel("Number of detections")
        ax.set_title("threshold %f" % threshold)
        if legend:
            h1, l1 = ax.get_legend_handles_labels()
            h2, l2 = ax2.get_legend_handles_labels()
            ax.legend(h1 + h2, l1 + l2, loc=2)
        return ax

    def plot_NB(self, src_ind, ax1=None, ax2=None, ax3=None):
        """Narrow-band check images around a Cat0 detection."""
        import matplotlib.pyplot as plt

        if self.Cat0 is None:
            raise ValueError("Run the step 07 to initialize self.Cat0")
        if ax1 is None and ax2 is None and ax3 is None:
            fig, (ax1, ax2, ax3) = plt.subplots(1, 3, figsize=(12, 4))

        x0 = int(np.asarray(self.Cat0["x0"])[src_ind])
        y0 = int(np.asarray(self.Cat0["y0"])[src_ind])
        z0 = int(np.asarray(self.Cat0["z0"])[src_ind])
        longxy0 = 20
        y01, y02 = max(0, y0 - longxy0), min(self.shape[1], y0 + longxy0 + 1)
        x01, x02 = max(0, x0 - longxy0), min(self.shape[2], x0 + longxy0 + 1)
        num_prof = int(np.asarray(self.Cat0["profile"])[src_ind])
        profile = self.profiles[num_prof]
        longz = (profile > 1e-13).sum() // 2
        intz1, intz2 = max(0, z0 - longz), min(self.shape[0], z0 + longz + 1)
        long0 = 2 * longz + 1
        cube_test = self.cube_raw[intz1:intz2, y01:y02, x01:x02]
        nb_ranges = 3
        if (z0 + longz + nb_ranges * long0) < self.shape[0]:
            intz1c, intz2c = intz1 + nb_ranges * long0, intz2 + nb_ranges * long0
        else:
            intz1c, intz2c = intz1 - nb_ranges * long0, intz2 - nb_ranges * long0
        cube_controle = self.cube_raw[intz1c:intz2c, y01:y02, x01:x02]
        diff = (1.0 / np.sqrt(2)) * (cube_test - cube_controle)
        for ax, cube, title in [
            (ax1, cube_test, "cube test - (%d,%d)" % (x0, y0)),
            (ax2, cube_controle, "check"),
            (ax3, diff, "difference"),
        ]:
            if ax is None:
                continue
            ax.plot(x0 - x01, y0 - y01, "m+")
            im = ax.imshow(cube.sum(axis=0), origin="lower")
            ax.set_title(title)
            plt.colorbar(im, ax=ax)
        return ax1, ax2, ax3

    def plot_sources(self, x, y, circle=False, vmin=0, vmax=30, title=None,
                     ax=None, **kwargs):
        """Detected line positions over the maxmap."""
        import matplotlib.pyplot as plt

        if ax is None:
            ax = plt.gca()
        kwargs.setdefault("origin", "lower")
        ax.imshow(self.maxmap.data, vmin=vmin, vmax=vmax, **kwargs)
        if title:
            ax.set_title(title)
        if circle:
            fwhm = (
                self.FWHM_PSF if self.wfields is None
                else np.max(np.asarray(self.FWHM_PSF))
            )
            radius = np.round(fwhm / 2)
            for pos in zip(x, y):
                ax.add_artist(plt.Circle(pos, radius, color="k", fill=False))
        else:
            ax.plot(x, y, "k+")
        return ax

    def plot_segmaps(self, axes=None, figsize=(6, 6)):
        """Show all segmentation maps of the session."""
        import matplotlib.pyplot as plt

        segmaps = {}
        for name in ("segmap_cont", "segmap_merged", "segmap_purity",
                     "segmap_label"):
            segm = getattr(self, name, None)
            if segm is not None:
                segmaps[name] = segm
        if not segmaps:
            self.logger.warning("nothing to plot")
            return
        nseg = len(segmaps)
        if axes is None:
            _, axes = plt.subplots(
                1, nseg, sharex=True, sharey=True,
                figsize=(figsize[0] * nseg, figsize[1]),
            )
        if nseg == 1:
            axes = [axes]
        for ax, (name, im) in zip(np.atleast_1d(axes), segmaps.items()):
            ax.imshow(im.data, cmap="nipy_spectral", origin="lower",
                      interpolation="nearest")
            ax.set_title(name)
        return axes

    def plot_min_max_hist(self, ax=None, comp=False):
        """Cumulative histograms of the local extrema values."""
        import matplotlib.pyplot as plt

        if comp:
            lmax = self.cube_std_local_max.data
            lmin = self.cube_std_local_min.data
        else:
            lmax = self.cube_local_max.data
            lmin = self.cube_local_min.data
        if ax is None:
            _, ax = plt.subplots(1, 1, figsize=(12, 6))
        ax.set_yscale("log")
        ax.grid(which="major", linewidth=1)
        ax.grid(which="minor", linewidth=1, linestyle=":")
        maxloc = lmax[lmax > 0]
        bins = np.arange((maxloc.max() + 1) * 2) / 2
        ax.hist(maxloc, bins=bins, histtype="step", label="max", linewidth=2,
                cumulative=-1)
        minloc = lmin[lmin > 0]
        bins = np.arange((minloc.max() + 1) * 2) / 2
        ax.hist(minloc, bins=bins, histtype="step", label="min", linewidth=2,
                cumulative=-1)
        if self.segmap_purity is not None:
            minloc2 = lmin[:, self.segmap_purity.data == 0]
            minloc2 = minloc2[minloc2 > 0]
            ax.hist(minloc2, bins=bins, histtype="step", label="min filt",
                    linewidth=2, cumulative=-1)
        ax.legend()
        ax.set_title("Cumulative histogram of min/max loc")
        return ax
