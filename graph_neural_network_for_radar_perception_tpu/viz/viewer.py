"""Sequence viewer — matplotlib replacement for the reference's PySide6
GUI (dataset/radar_scenes/radar_scenes/viewer.py, 1059 LoC of Qt).

Headless-friendly: renders frame-by-frame panels (measurements coloured
by class/track/doppler, optional prediction overlay) and steps through a
sequence interactively (matplotlib key events) or exports the walk as
PNGs/GIF for remote use.
"""

from __future__ import annotations

import os
from typing import Callable, Iterator, List, Optional

import numpy as np

from ..data.labels import NEW_LABELS
from .plots import _CLASS_COLORS, plot_node_classes, set_roi


class SequenceViewer:
    """Step through frames; in notebooks/desktops use .show() for key
    navigation (←/→), headless use .export()."""

    def __init__(
        self,
        frames: List,
        render: Optional[Callable] = None,
        figsize=(9, 9),
        roi=None,
    ):
        self.frames = frames
        self.render = render or self._default_render
        self.figsize = figsize
        self.roi = roi or {}
        self.idx = 0

    def _default_render(self, ax, fr):
        px = fr.other_feat[:, 0]
        py = fr.other_feat[:, 1]
        plot_node_classes(px, py, fr.node_class, ax=ax, **self.roi)

    def _draw(self, fig, ax):
        ax.clear()
        self.render(ax, self.frames[self.idx])
        ax.set_title(f"frame {self.idx + 1}/{len(self.frames)}")
        fig.canvas.draw_idle()

    def show(self):
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=self.figsize)

        def on_key(event):
            if event.key in ("right", "n"):
                self.idx = (self.idx + 1) % len(self.frames)
            elif event.key in ("left", "p"):
                self.idx = (self.idx - 1) % len(self.frames)
            else:
                return
            self._draw(fig, ax)

        fig.canvas.mpl_connect("key_press_event", on_key)
        self._draw(fig, ax)
        plt.show()
        return fig

    def export(self, out_dir: str, gif: bool = True, fps: int = 4):
        import matplotlib

        matplotlib.use("Agg", force=False)
        import matplotlib.pyplot as plt

        os.makedirs(out_dir, exist_ok=True)
        paths = []
        for i in range(len(self.frames)):
            self.idx = i
            fig, ax = plt.subplots(figsize=self.figsize)
            self._draw(fig, ax)
            p = os.path.join(out_dir, f"frame_{i:04d}.png")
            fig.savefig(p, dpi=90)
            plt.close(fig)
            paths.append(p)
        if gif and paths:
            from .plots import save_frames_as_gif

            return save_frames_as_gif(
                paths, os.path.join(out_dir, "sequence.gif"), fps=fps
            )
        return paths


def doppler_render(ax, fr, roi=None):
    """Colour by range-rate (viewer 'doppler' display mode)."""
    px, py = fr.other_feat[:, 0], fr.other_feat[:, 1]
    sc = ax.scatter(
        px, py, c=fr.node_feat[:, 0], s=8, cmap="coolwarm", marker="."
    )
    set_roi(ax, **(roi or {}))
    return sc
