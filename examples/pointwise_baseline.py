"""Per-point semantic-segmentation baseline + prediction-JSON export.

Capability parity with the vendored dataset package's example
(dataset/radar_scenes/radar_scenes/examples/classification.py): build the
4-feature per-point vector [x, y, compensated vr, rcs]
(classification.py:109-122), train a point-wise classifier, and export
predictions in both viewer JSON schemas (SemSeg / InstSeg,
evaluation.py:10-56).  Where the reference ships a *mock* network that
samples from the GT, this example trains a real jitted MLP with optax —
a floor baseline to compare the GNN against (no spatial context, so it
mostly learns the class prior + velocity/rcs cues).

Run: python examples/pointwise_baseline.py [--platform cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def features_from_frame(data):
    """classification.py:109-122 — [x, y, vr, rcs] per detection."""
    return np.stack(
        [data["meas_px"], data["meas_py"], data["meas_vr"],
         data["meas_rcs"]], axis=-1,
    ).astype(np.float32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default=None)
    p.add_argument("--frames", type=int, default=64)
    p.add_argument("--iters", type=int, default=300)
    p.add_argument("--out", default="runs/pointwise_baseline")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import optax

    from graph_neural_network_for_radar_perception_tpu.data import labels as L
    from graph_neural_network_for_radar_perception_tpu.data.synthetic import (
        make_synthetic_frame,
    )
    from graph_neural_network_for_radar_perception_tpu.utils.export import (
        PredictionFileSchemas, per_point_predictions_to_json,
    )

    rng = np.random.default_rng(0)
    lut = L.old_to_new_label_id_map()

    def sample(seed_rng):
        d = make_synthetic_frame(seed_rng, num_objects=6, window_size=5)
        y = L.reassign_label_ids(d["meas_label_id"], lut)
        return features_from_frame(d), y.astype(np.int32), d

    train = [sample(rng) for _ in range(args.frames)]
    X = np.concatenate([t[0] for t in train])
    Y = np.concatenate([t[1] for t in train])
    mu, sd = X.mean(0), X.std(0) + 1e-6

    key = jax.random.key(0)
    dims = [4, 64, 64, L.NUM_CLASSES_ALL]
    params = []
    for din, dout in zip(dims[:-1], dims[1:]):
        key, k = jax.random.split(key)
        params.append({
            "w": jax.random.normal(k, (din, dout)) * (1.0 / np.sqrt(din)),
            "b": jnp.zeros((dout,)),
        })

    def forward(params, x):
        for i, lyr in enumerate(params):
            x = x @ lyr["w"] + lyr["b"]
            if i + 1 < len(params):
                x = jax.nn.relu(x)
        return x

    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    Xn = jnp.asarray((X - mu) / sd)
    Yj = jnp.asarray(Y)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits = forward(p, x)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y
            ).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for it in range(args.iters):
        params, opt_state, loss = step(params, opt_state, Xn, Yj)
        if (it + 1) % 100 == 0:
            print(f"iter {it + 1}: loss {float(loss):.4f}")

    # validation frame → predictions → both export schemas
    Xv, Yv, dv = sample(np.random.default_rng(123))
    logits = forward(params, jnp.asarray((Xv - mu) / sd))
    pred = np.asarray(jnp.argmax(logits, -1))
    acc = float((pred == Yv).mean())
    print(f"val per-point accuracy: {acc:.3f} ({len(Yv)} points)")

    os.makedirs(args.out, exist_ok=True)
    uuids = [f"pt-{i:05d}" for i in range(len(pred))]
    translation = {i: name for i, name in enumerate(L.NEW_LABELS)}
    per_point_predictions_to_json(
        dict(zip(uuids, pred.tolist())),
        os.path.join(args.out, "predictions_semseg.json"),
        translation, PredictionFileSchemas.SemSeg,
    )
    # instance ids from GT trackids (the reference example does the same
    # for its InstSeg demo: classification.py:64-107)
    _, inst = np.unique(dv["meas_trackid"], return_inverse=True)
    per_point_predictions_to_json(
        {u: [int(c), int(i)] for u, c, i in zip(uuids, pred, inst)},
        os.path.join(args.out, "predictions_instseg.json"),
        translation, PredictionFileSchemas.InstSeg,
    )
    print(f"wrote {args.out}/predictions_{{semseg,instseg}}.json")


if __name__ == "__main__":
    main()
