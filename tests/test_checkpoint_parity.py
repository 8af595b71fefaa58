"""Per-layer activation parity against the reference's shipped PyTorch
checkpoint (BASELINE.md: "Per-layer activation parity vs PyTorch checkpoint
— allclose").

The reference model itself needs torch_geometric (absent here), so this
test re-executes the reference forward in plain torch from its published
recipe: ffn blocks with the scalar-affine channel norm
(common.py:185-220), gather → message-MLP → index_add scatter with
flow="source_to_target" (gnn_blocks.py:45-113), triu link head
(gnn_blocks.py:274-344), per-cluster max-pool object head
(gnn_blocks.py:347-389) — then loads the SAME checkpoint into the flax
model via utils/torch_import and diffs all four task outputs on a real
preprocessed frame."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

CKPT = "/root/reference/model_weights/gnn/1718175257362/graph_based_detector.pt"

pytestmark = pytest.mark.skipif(
    not os.path.exists(CKPT), reason="reference checkpoint not present"
)

EPS = 1e-5
SLOPE = 0.01


def ffn(x, sd, prefix, normed=True):
    w = sd[f"{prefix}.block.0.weight"]
    b = sd[f"{prefix}.block.0.bias"]
    x = x @ w.T + b
    if normed:
        mean = x.mean(dim=1, keepdim=True)
        std = x.std(dim=1, keepdim=True)  # Bessel-corrected
        x = (x - mean) / (std + EPS)
        x = sd[f"{prefix}.block.1.std"] * x + sd[f"{prefix}.block.1.mu"]
    return torch.nn.functional.leaky_relu(x, SLOPE)


def encoder(x, sd, top, n_blocks):
    for i in range(n_blocks):
        x = ffn(x, sd, f"{top}.encoder.{i}", normed=(i != 0))
    return x


def head(x, sd, top, head_attr):
    x = ffn(x, sd, f"{top}.{head_attr}.head.0")
    w = sd[f"{top}.{head_attr}.head.1.weight"]
    b = sd[f"{top}.{head_attr}.head.1.bias"]
    return x @ w.T + b


def reference_forward(sd, node_feat, edge_feat, senders, receivers,
                      und_s, und_r, cluster_members):
    x = encoder(node_feat, sd, "encode_node_feat", 3)
    e = encoder(edge_feat, sd, "encode_edge_feat", 4)

    n = x.shape[0]
    for b in range(7):
        m = torch.cat([x[receivers], x[senders], e], dim=-1)
        m = ffn(m, sd, f"pass_messages.conv_blk.{b}.msg.0")
        m = ffn(m, sd, f"pass_messages.conv_blk.{b}.msg.1")
        agg = torch.zeros_like(x).index_add_(0, receivers, m)
        upd = ffn(
            torch.cat([x, agg], dim=-1), sd,
            f"pass_messages.conv_blk.{b}.upd.0",
        )
        x = x + upd

    stem = lambda z, top, k=3: [
        z := ffn(z, sd, f"{top}.stem.{i}") for i in range(k)
    ][-1]

    node_cls = head(stem(x, "predict_node"), sd, "predict_node", "pred_cls")
    node_off = head(
        stem(x, "predict_offset"), sd, "predict_offset", "pred_offsets"
    )

    xe = ffn(x, sd, "predict_link.compute_edge.stem.0")
    el = xe[und_s] + xe[und_r]
    el = stem(el, "predict_link")
    edge_cls = head(el, sd, "predict_link", "pred_cls")

    xo = stem(x, "predict_class")
    pooled = torch.stack(
        [xo[idx].max(dim=0).values for idx in cluster_members], dim=0
    )
    obj_cls = head(pooled, sd, "predict_class", "pred_cls")
    return node_cls, node_off, edge_cls, obj_cls


@pytest.fixture(scope="module")
def frame():
    from graph_neural_network_for_radar_perception_tpu.config.config import (
        GNNConfig,
    )
    from graph_neural_network_for_radar_perception_tpu.data.pipeline import (
        SyntheticRadarDataset,
    )

    cfg = GNNConfig(
        max_nodes=512, max_clusters=256, temporal_window_size=5,
        dataset_augmentation=False,
    )
    ds = SyntheticRadarDataset(cfg, seed=11, num_objects=4)
    return cfg, ds.sample_frame()


def test_checkpoint_activation_parity(frame):
    import jax
    import jax.numpy as jnp

    from graph_neural_network_for_radar_perception_tpu.data.pipeline import (
        pad_frame,
    )
    from graph_neural_network_for_radar_perception_tpu.models.gnn import (
        RadarGNN,
    )
    from graph_neural_network_for_radar_perception_tpu.train.steps import (
        init_params,
    )
    from graph_neural_network_for_radar_perception_tpu.utils.torch_import import (
        load_reference_checkpoint,
    )

    cfg, fr = frame
    sd = {
        k[5:]: v for k, v in torch.load(CKPT, map_location="cpu").items()
    }

    # --- torch reference executor on the unpadded frame ------------------
    t = lambda a, dt=torch.float32: torch.tensor(np.asarray(a), dtype=dt)
    n_clusters = int(fr.cluster_class.shape[0])
    members = [
        torch.tensor(np.flatnonzero(fr.node2cluster == c))
        for c in range(n_clusters)
    ]
    ref = reference_forward(
        sd, t(fr.node_feat), t(fr.edge_feat),
        t(fr.senders, torch.long), t(fr.receivers, torch.long),
        t(fr.und_senders, torch.long), t(fr.und_receivers, torch.long),
        members,
    )

    # --- flax model with imported weights on the padded frame ------------
    params = init_params(cfg, jax.random.key(0))
    params = load_reference_checkpoint(params, CKPT)
    graph, labels = pad_frame(fr, cfg)
    graph = jax.tree.map(jnp.asarray, graph)
    model = RadarGNN(cfg)
    out = model.apply(
        {"params": params}, graph,
        jnp.asarray(labels.node2cluster), cfg.max_clusters,
        jnp.asarray(labels.cluster_mask),
    )

    n, eu, c = fr.n, fr.und_senders.shape[0], n_clusters
    pairs = [
        ("node_cls", ref[0].numpy(), np.asarray(out.node_cls)[:n]),
        ("node_offsets", ref[1].numpy(), np.asarray(out.node_offsets)[:n]),
        ("edge_cls", ref[2].numpy(), np.asarray(out.edge_cls)[:eu]),
        ("obj_cls", ref[3].numpy(), np.asarray(out.obj_cls)[:c]),
    ]
    for name, want, got in pairs:
        np.testing.assert_allclose(
            got, want, rtol=2e-3, atol=2e-4, err_msg=name
        )


def test_all_checkpoint_keys_consumed(frame):
    """The importer must account for every tensor in the checkpoint."""
    import jax

    from graph_neural_network_for_radar_perception_tpu.train.steps import (
        init_params,
    )
    from graph_neural_network_for_radar_perception_tpu.utils.torch_import import (
        load_reference_checkpoint,
    )

    cfg, _ = frame
    params = init_params(cfg, jax.random.key(0))
    load_reference_checkpoint(params, CKPT)  # raises if any key unmapped
