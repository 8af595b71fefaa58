"""BEV grid data plane for the CNN branch.

Re-designs modules/compute_features/grid_features.py (grid_properties +
encoding functions) with static shapes and device-friendly ops:

* gridification: measurements are scored (dynamic ≫ static, then by
  inverse range; grid_features "compute_meas_priority"), sorted ascending
  and scattered into the grid so the highest-priority measurement wins
  each cell — reproduced as a sort + `.at[].set` (last write wins);
* encodings: per-cell nearest-measurement Mahalanobis likelihood map and
  normalised range/azimuth maps (grid_features.py:compute_encodings),
  implemented in jnp over fixed-capacity padded measurement arrays.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .labels import INVALID_NUM, ID_STATIC


@dataclasses.dataclass(frozen=True)
class GridSpec:
    min_x: float = 0.0
    max_x: float = 100.0
    min_y: float = -50.0
    max_y: float = 50.0
    dx: float = 0.5
    dy: float = 0.5
    min_sigma_x: float = 0.5
    max_sigma_x: float = 2.0
    min_sigma_y: float = 0.5
    max_sigma_y: float = 2.0

    @property
    def num_x(self) -> int:
        return int(round((self.max_x - self.min_x) / self.dx))

    @property
    def num_y(self) -> int:
        return int(round((self.max_y - self.min_y) / self.dy))

    @property
    def max_range(self) -> float:
        return float(np.hypot(self.max_x, self.max_y))

    def cell_index(self, px, py):
        ix = jnp.clip(
            ((px - self.min_x) / self.dx).astype(jnp.int32), 0, self.num_x - 1
        )
        iy = jnp.clip(
            ((py - self.min_y) / self.dy).astype(jnp.int32), 0, self.num_y - 1
        )
        return ix, iy

    def cell_centers(self) -> np.ndarray:
        """[num_x, num_y, 2] cell-center coordinates."""
        xs = self.min_x + (np.arange(self.num_x) + 0.5) * self.dx
        ys = self.min_y + (np.arange(self.num_y) + 0.5) * self.dy
        gx, gy = np.meshgrid(xs, ys, indexing="ij")
        return np.stack([gx, gy], axis=-1).astype(np.float32)


def measurement_priority(px, py, stationary_flag, max_range):
    """grid_features compute_meas_priority: dynamic returns dominate, then
    nearer-range wins."""
    rng = jnp.sqrt(px**2 + py**2)
    digits = jnp.floor(jnp.log10(max_range) + 1.0)
    return (
        jnp.where(stationary_flag, 0.0, 1.0) * 10.0**digits
        + max_range - rng
    )


def gridify(
    spec: GridSpec,
    px, py, values, labels, mask,
):
    """Scatter per-measurement rows into the grid, highest priority last.

    values: [N, D] extra per-measurement channels (e.g. vr, rcs, offsets).
    labels: [N] class labels (STATIC id marks stationary for priority).
    Returns (value_grid [X, Y, D], label_grid [X, Y] with INVALID_NUM in
    empty cells)."""
    stationary = labels == ID_STATIC
    score = measurement_priority(px, py, stationary, spec.max_range)
    score = jnp.where(mask, score, -jnp.inf)
    order = jnp.argsort(score)  # ascending: highest priority written last

    pxs, pys = px[order], py[order]
    vs = values[order]
    ls = labels[order]
    ms = mask[order]

    ix, iy = spec.cell_index(pxs, pys)
    # invalid rows write to a dumped extra row
    ix = jnp.where(ms, ix, spec.num_x)

    vgrid = jnp.zeros((spec.num_x + 1, spec.num_y, values.shape[-1]),
                      values.dtype)
    lgrid = jnp.full((spec.num_x + 1, spec.num_y), INVALID_NUM, jnp.float32)
    vgrid = vgrid.at[ix, iy].set(vs, mode="drop")
    lgrid = lgrid.at[ix, iy].set(ls.astype(jnp.float32), mode="drop")
    return vgrid[: spec.num_x], lgrid[: spec.num_x]


def linear_sigma(v, vmin, vmax, smin, smax):
    """grid_features compute_sigma_linear."""
    t = (jnp.abs(v) - vmin) / (vmax - vmin)
    return smin + jnp.clip(t, 0.0, 1.0) * (smax - smin)


def measurement_covariances(spec: GridSpec, px, py):
    """Range-dependent, azimuth-aligned 2x2 covariances
    (grid_features compute_covariance_linearly_varying)."""
    theta = jnp.arctan2(py, px)
    c, s = jnp.cos(theta), jnp.sin(theta)
    rot = jnp.stack(
        [jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], axis=-2
    )  # [N, 2, 2]
    sx = linear_sigma(px, spec.min_x, spec.max_x,
                      spec.min_sigma_x, spec.max_sigma_x)
    sy = linear_sigma(py, spec.min_y, spec.max_y,
                      spec.min_sigma_y, spec.max_sigma_y)
    diag = jnp.zeros(px.shape + (2, 2))
    diag = diag.at[..., 0, 0].set(sx).at[..., 1, 1].set(sy)
    return rot @ diag @ jnp.swapaxes(rot, -1, -2)


def range_azimuth_encoding(spec: GridSpec):
    """Normalised range/azimuth maps over cell centers
    (grid_features compute_range_azimuth_encoding).  Returns numpy
    [X, Y] pair (static per grid spec)."""
    centers = spec.cell_centers()
    r = np.sqrt(centers[..., 0] ** 2 + centers[..., 1] ** 2)
    th = np.abs(np.arctan2(centers[..., 1], centers[..., 0]))
    r_map = (r - r.max()) / (r.min() - r.max())
    th_map = (th - th.max()) / (th.min() - th.max())
    return r_map.astype(np.float32), th_map.astype(np.float32)


def likelihood_map(
    spec: GridSpec, meas_xy, meas_cov, mask, cell_centers
):
    """Nearest-measurement Gaussian likelihood per cell
    (grid_features compute_meas_likelihood), fixed-capacity masked.

    meas_xy: [M, 2]; meas_cov: [M, 2, 2]; cell_centers [X, Y, 2]."""
    x, y, _ = cell_centers.shape
    grid = cell_centers.reshape(-1, 2)  # [C, 2]
    d = grid[:, None, :] - meas_xy[None, :, :]  # [C, M, 2]
    d2 = jnp.sum(d * d, axis=-1)
    d2 = jnp.where(mask[None, :], d2, jnp.inf)
    nearest = jnp.argmin(d2, axis=-1)  # [C]

    cov = meas_cov[nearest]  # [C, 2, 2]
    cov_inv = jnp.linalg.inv(cov)
    dn = grid - meas_xy[nearest]  # [C, 2]
    m = jnp.einsum("ci,cij,cj->c", dn, cov_inv, dn)
    prob = jnp.exp(-0.5 * m)
    any_valid = jnp.any(mask)
    prob = jnp.where(any_valid, prob, 0.0)
    return prob.reshape(x, y)


def build_grid_sample(
    spec: GridSpec,
    data: dict,
    gt: dict,
    max_meas: int,
):
    """One CNN-branch training sample from a preprocessed frame
    (datagen_cnn.py:15-92 equivalent): gridified (vr, rcs, offx, offy) and
    label grids plus the 3-channel input image.

    data/gt follow the reference data_dict / gt dict schema AFTER ROI
    filtering.  Measurements are padded to max_meas.
    Returns dict of numpy arrays: image [X,Y,3], vr [X,Y], rcs [X,Y],
    label_grid [X,Y], offset_grid [X,Y,2].
    """
    n = data["meas_px"].shape[0]
    m = min(n, max_meas)

    def pad(x, fill=0.0):
        out = np.full((max_meas,), fill, dtype=np.float32)
        out[:m] = np.asarray(x, np.float32)[:m]
        return jnp.asarray(out)

    px, py = pad(data["meas_px"]), pad(data["meas_py"])
    mask = jnp.asarray(np.arange(max_meas) < m)
    labels = pad(gt["class_labels"], fill=INVALID_NUM)
    values = jnp.stack(
        [
            pad(data["meas_vr"]),
            pad(data["meas_rcs"]),
            pad(gt["offsetx"]),
            pad(gt["offsety"]),
        ],
        axis=-1,
    )
    vgrid, lgrid = gridify(spec, px, py, values, labels, mask)
    centers = jnp.asarray(spec.cell_centers())
    image = build_grid_image(spec, px, py, labels, mask, centers)
    return {
        "image": np.asarray(image),
        "vr": np.asarray(vgrid[..., 0]),
        "rcs": np.asarray(vgrid[..., 1]),
        "offset_grid": np.asarray(vgrid[..., 2:4]),
        "label_grid": np.asarray(lgrid),
    }


def build_grid_image(spec: GridSpec, px, py, labels, mask, cell_centers_j):
    """[X, Y, 3] input image: likelihood, range map, azimuth map
    (input_image_dimension=3, configuration_radarscenes_cnn.yml)."""
    meas_xy = jnp.stack([px, py], axis=-1)
    cov = measurement_covariances(spec, px, py)
    lik = likelihood_map(spec, meas_xy, cov, mask, cell_centers_j)
    r_map, th_map = range_azimuth_encoding(spec)
    return jnp.stack(
        [lik, jnp.asarray(r_map), jnp.asarray(th_map)], axis=-1
    )
