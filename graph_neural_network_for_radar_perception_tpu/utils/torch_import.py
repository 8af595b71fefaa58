"""Import the reference PyTorch checkpoint into the flax parameter tree.

Maps the reference's state_dict layout (Model_Training → pred.* keys,
modules/neural_net/gnn/gnn_detector.py:419-423) onto this framework's
module tree so the shipped weights
(model_weights/gnn/1718175257362/graph_based_detector.pt) can drive
per-layer activation-parity checks (BASELINE.md last row) and real
inference.

Flax → torch path grammar (leaf rules at the bottom):
  encode_*                MLPStack_0/FFNBlock_i/…       → encoder.{i}
  pass_messages           ResidualGraphConvBlock_b/
                            MLPStack_0/FFNBlock_j/…     → conv_blk.{b}.msg.{j}
                            MLPStack_1/FFNBlock_j/…     → conv_blk.{b}.upd.{j}
                            Linear_0|ScalarNorm_0       → conv_blk.{b}.residual_connection.{0|1}
  predict_node|offset|class MLPStack_0/FFNBlock_j/…     → stem.{j}
  predict_link            FFNBlock_j/…                  → compute_edge.stem.{j}
                          MLPStack_0/FFNBlock_j/…       → stem.{j}
  (any)                   TaskSpecificHead_0/FFNBlock_0 → {pred_cls|pred_offsets}.head.0
                          TaskSpecificHead_0/Dense_0    → {…}.head.1 (bare Linear)
Leaves: kernel→weight (transposed), bias→bias, gamma→std, beta→mu; inside
an ffn_block the Linear is `.block.0` and the norm `.block.1`
(modules/neural_net/common.py:185-253).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _idx(name: str) -> int:
    return int(name.split("_")[-1])


def flax_path_to_torch_key(parts) -> str:
    """parts: tuple of module names ending with the leaf param name."""
    top, *mods, leaf = parts
    head_attr = "pred_offsets" if top == "predict_offset" else "pred_cls"

    segs = [top]
    bare_linear = False  # final head Linear / projector have no .block wrapper
    bare_norm = False
    i = 0
    while i < len(mods):
        m = mods[i]
        if m.startswith("MLPStack"):
            stack = _idx(m)
            j = _idx(mods[i + 1])  # following FFNBlock
            if top.startswith("encode_"):
                segs.append(f"encoder.{j}")
            elif segs[-1].startswith("conv_blk"):
                segs[-1] += f".{'msg' if stack == 0 else 'upd'}.{j}"
            else:
                segs.append(f"stem.{j}")
            i += 2
        elif m.startswith("ResidualGraphConvBlock"):
            segs.append(f"conv_blk.{_idx(m)}")
            # projector case: next is Linear_0 or ScalarNorm_0 directly
            nxt = mods[i + 1] if i + 1 < len(mods) else ""
            if nxt.startswith("Linear"):
                segs[-1] += ".residual_connection.0"
                bare_linear = True
                i += 2
            elif nxt.startswith("ScalarNorm"):
                segs[-1] += ".residual_connection.1"
                bare_norm = True
                i += 2
            else:
                i += 1
        elif m.startswith("TaskSpecificHead"):
            nxt = mods[i + 1]
            if nxt.startswith("FFNBlock"):
                segs.append(f"{head_attr}.head.0")
                i += 2
            else:  # Dense_0 — the bare final Linear
                segs.append(f"{head_attr}.head.1")
                bare_linear = True
                i += 2
        elif m.startswith("FFNBlock"):
            # bare FFNBlock directly under predict_link = edge_formation stem
            assert top == "predict_link", parts
            segs.append(f"compute_edge.stem.{_idx(m)}")
            i += 1
        else:  # Linear_k / Dense_k / ScalarNorm_k inside an ffn_block
            i += 1

    if leaf == "kernel":
        suffix, is_norm = "weight", False
    elif leaf == "bias":
        suffix, is_norm = "bias", False
    elif leaf == "gamma":
        suffix, is_norm = "std", True
    elif leaf == "beta":
        suffix, is_norm = "mu", True
    else:
        raise KeyError(f"unknown leaf {leaf} in {parts}")

    key = ".".join(segs)
    if is_norm and not bare_norm:
        key += ".block.1"
    elif not is_norm and not bare_linear:
        key += ".block.0"
    return f"{key}.{suffix}"


def import_torch_checkpoint(flax_params, state_dict: Dict[str, object]):
    """Return a new flax param tree filled from the reference state_dict
    (``pred.``-prefixed keys accepted)."""
    import jax

    sd = {}
    for k, v in state_dict.items():
        sd[k[5:] if k.startswith("pred.") else k] = np.asarray(
            v.detach().cpu().numpy() if hasattr(v, "detach") else v
        )

    used = set()

    def fill(path, leaf_value):
        parts = tuple(p.key if hasattr(p, "key") else str(p) for p in path)
        key = flax_path_to_torch_key(parts)
        if key not in sd:
            raise KeyError(
                f"flax path {'/'.join(parts)} → torch key {key!r} not in "
                f"checkpoint"
            )
        used.add(key)
        arr = sd[key]
        if parts[-1] == "kernel" and arr.ndim == 2:
            arr = arr.T  # torch [out, in] → flax [in, out]
        assert arr.shape == leaf_value.shape, (
            f"{key}: {arr.shape} vs {leaf_value.shape}"
        )
        return arr.astype(np.float32)

    new_params = jax.tree_util.tree_map_with_path(fill, flax_params)
    missing = set(sd) - used
    if missing:
        raise KeyError(f"checkpoint keys not consumed: {sorted(missing)[:8]}")
    return new_params


def load_reference_checkpoint(flax_params, path: str):
    import torch

    sd = torch.load(path, map_location="cpu")
    return import_torch_checkpoint(flax_params, sd)
