"""Matplotlib plot helpers (reference bindings/python/robotoc/utils/plot.py:
PlotConvergence / PlotContactForce / PlotCoMVelocity). Import is lazy so the
library has no hard matplotlib dependency."""
from __future__ import annotations

import numpy as np


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


class PlotConvergence:
    """KKT error vs iteration (log scale), optionally marking mesh
    refinements (reference plot.py PlotConvergence)."""

    def __init__(self, figsize=(6, 4)):
        self.figsize = figsize

    def plot(self, kkt_data, mesh_refinement_iters=(), fig_name="kkt",
             save_dir="."):
        plt = _plt()
        fig, ax = plt.subplots(figsize=self.figsize)
        ax.semilogy(np.arange(len(kkt_data)), np.asarray(kkt_data),
                    marker=".")
        for it in mesh_refinement_iters:
            ax.axvline(it, color="gray", linestyle="--", alpha=0.5)
        ax.set_xlabel("iteration")
        ax.set_ylabel("KKT error")
        ax.grid(True, alpha=0.3)
        path = f"{save_dir}/{fig_name}.png"
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return path


class PlotContactForce:
    """Per-contact force components over the horizon / a simulation log
    (reference plot.py PlotContactForce)."""

    def __init__(self, contact_names=None, figsize=(8, 6)):
        self.contact_names = contact_names
        self.figsize = figsize

    def plot(self, t, f, fig_name="contact_force", save_dir="."):
        """t: (K,), f: (K, nc*3) local forces stacked per contact."""
        plt = _plt()
        f = np.asarray(f)
        nc = f.shape[1] // 3
        names = self.contact_names or [f"contact {i}" for i in range(nc)]
        fig, axes = plt.subplots(nc, 1, figsize=self.figsize, sharex=True)
        if nc == 1:
            axes = [axes]
        for c in range(nc):
            for k, lbl in enumerate("xyz"):
                axes[c].plot(t, f[:, 3 * c + k], label=f"f{lbl}")
            axes[c].set_ylabel(names[c])
            axes[c].grid(True, alpha=0.3)
        axes[0].legend(loc="upper right", fontsize=8)
        axes[-1].set_xlabel("t [s]")
        path = f"{save_dir}/{fig_name}.png"
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return path


class PlotCoMVelocity:
    """CoM velocity vs command (reference plot.py PlotCoMVelocity)."""

    def __init__(self, figsize=(8, 4)):
        self.figsize = figsize

    def plot(self, t, vcom, vcom_cmd=None, fig_name="com_velocity",
             save_dir="."):
        plt = _plt()
        vcom = np.asarray(vcom)
        fig, ax = plt.subplots(figsize=self.figsize)
        for k, lbl in enumerate("xyz"[: vcom.shape[1]]):
            ax.plot(t, vcom[:, k], label=f"v{lbl}")
        if vcom_cmd is not None:
            vcom_cmd = np.asarray(vcom_cmd)
            for k in range(vcom_cmd.shape[1]):
                ax.plot(t, vcom_cmd[:, k], "--", alpha=0.6)
        ax.set_xlabel("t [s]")
        ax.set_ylabel("CoM velocity [m/s]")
        ax.legend()
        ax.grid(True, alpha=0.3)
        path = f"{save_dir}/{fig_name}.png"
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return path
