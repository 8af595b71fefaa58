"""Finetune the object head over DBSCAN proposals
(script_finetune_model_gnn_objcls_pred.ipynb analog): the trunk is frozen
and clustering runs inside the jitted forward.

Run: python examples/finetune_obj_classifier.py --iters 500
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=500)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from graph_neural_network_for_radar_perception_tpu.config.config import (
        GNNConfig,
    )
    from graph_neural_network_for_radar_perception_tpu.data.pipeline import (
        SyntheticRadarDataset,
    )
    from graph_neural_network_for_radar_perception_tpu.train.finetune import (
        make_finetune_step,
    )
    from graph_neural_network_for_radar_perception_tpu.train.steps import (
        TrainState, init_params,
    )

    cfg = GNNConfig(
        max_nodes=384, max_clusters=192, temporal_window_size=5,
        batch_size=args.batch_size,
    )
    params = init_params(cfg, jax.random.key(0))
    build, _ = make_finetune_step(cfg)
    step, tx = build(params)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))

    ds = SyntheticRadarDataset(cfg, seed=7, num_objects=4)
    gen = ds.batches(cfg.batch_size)
    for it in range(args.iters):
        batch = jax.tree.map(jnp.asarray, next(gen))
        state, m = step(state, batch)
        if (it + 1) % max(args.iters // 10, 1) == 0:
            print(
                f"iter {it + 1}: obj loss {float(m['loss_obj_cls']):.4f} "
                f"acc {float(m['object_accuracy']):.3f}"
            )


if __name__ == "__main__":
    main()
