"""Frame-level detection pipeline: preprocess → model → decode → proposals.

TPU-native re-design of modules/inference/output.py:26-363 (process_frame /
compare_pred_and_gt_cluster): one jitted deploy forward per padded frame
(DBSCAN on device), decoded to numpy detections with per-cluster
statistics, object classes either from the object head or by
segmentation-majority vote (output.py:112-121), and the FALSE class
filtered from final detections (output.py:123-128).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config.config import GNNConfig
from ..data.labels import ID_FALSE
from ..data.pipeline import FrameArrays, pad_frame, preprocess_frame
from ..models.gnn import RadarGNN
from .proposals import compute_proposals


@dataclasses.dataclass
class FrameDetections:
    """Decoded per-frame outputs (unpadded numpy)."""

    node_class: np.ndarray        # [n] predicted class ids
    node_score: np.ndarray        # [n] softmax score of the argmax class
    centers: np.ndarray           # [n, 2] decoded cluster centers
    link_class: np.ndarray        # [eu] predicted link labels
    node2cluster: np.ndarray      # [n] DBSCAN cluster id
    num_clusters: int
    cluster_mu: np.ndarray        # [C, 2]
    cluster_sigma: np.ndarray     # [C, 2, 2]
    cluster_size: np.ndarray      # [C]
    cluster_class: np.ndarray     # [C] chosen object class per cluster
    xy: np.ndarray                # [n, 2] measurement positions
    gt: Optional[FrameArrays] = None

    def detections(self, filter_false: bool = True) -> Dict[str, np.ndarray]:
        """Final object list; drops class FALSE like output.py:123-128."""
        keep = np.ones(self.num_clusters, dtype=bool)
        if filter_false:
            keep &= self.cluster_class[: self.num_clusters] != ID_FALSE
        idx = np.flatnonzero(keep)
        return {
            "mu": self.cluster_mu[idx],
            "sigma": self.cluster_sigma[idx],
            "size": self.cluster_size[idx],
            "obj_class": self.cluster_class[idx],
            "cluster_ids": idx,
        }


class FrameDetector:
    """Jit-compiled deploy-mode detector over padded frames."""

    def __init__(
        self,
        cfg: GNNConfig,
        params,
        *,
        eps: float = 1.4,
        from_links: bool = False,
        use_object_head: bool = True,
    ):
        self.cfg = cfg
        self.params = params
        self.use_object_head = use_object_head
        model = RadarGNN(cfg)

        @jax.jit
        def _run(params, graph):
            out = model.apply(
                {"params": params}, graph, eps=eps, from_links=from_links,
                method=RadarGNN.deploy,
            )
            node_prob = jax.nn.softmax(out.node_cls, axis=-1)
            return out, node_prob

        self._run = _run

    def detect_frame_arrays(self, fr: FrameArrays) -> FrameDetections:
        graph, labels = pad_frame(fr, self.cfg)
        graph_j = jax.tree.map(jnp.asarray, graph)
        out, node_prob = self._run(self.params, graph_j)

        n = min(fr.n, self.cfg.max_nodes)  # pad_frame truncates oversize
        node_prob = np.asarray(node_prob)[:n]
        node_cls = node_prob.argmax(-1)
        node2cluster = np.asarray(out.node2cluster)[:n]
        num_clusters = int(out.num_clusters)

        node_cls_padded = np.pad(node_cls, (0, self.cfg.max_nodes - n))
        props = compute_proposals(
            graph_j.other_feat[:, :2],
            jnp.asarray(node_cls_padded),
            out.node2cluster,
            graph_j.node_mask,
            self.cfg.max_nodes,
            self.cfg.num_classes,
        )
        if self.use_object_head:
            cluster_class = np.asarray(
                jnp.argmax(out.obj_cls, axis=-1)
            )
        else:  # segmentation-majority (output.py:112-121)
            cluster_class = np.asarray(props.label)

        return FrameDetections(
            node_class=node_cls.astype(np.int32),
            node_score=node_prob.max(-1),
            centers=np.asarray(out.centers)[:n],
            link_class=np.asarray(
                jnp.argmax(out.edge_cls, axis=-1)
            )[: min(fr.und_senders.shape[0], self.cfg.max_und_edges)],
            node2cluster=node2cluster,
            num_clusters=num_clusters,
            cluster_mu=np.asarray(props.mu),
            cluster_sigma=np.asarray(props.sigma),
            cluster_size=np.asarray(props.size),
            cluster_class=cluster_class.astype(np.int32),
            xy=fr.other_feat[:n, :2],
            gt=fr,
        )

    def detect(self, data_dict: dict) -> Optional[FrameDetections]:
        """Full pipeline from a raw windowed data_dict."""
        fr = preprocess_frame(data_dict, self.cfg)
        if fr is None:
            return None
        return self.detect_frame_arrays(fr)
