"""Train the BEV-grid CNN detector (script_train_model_cnn.ipynb analog).

Run: python examples/train_cnn.py --iters 200
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=200)
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--grid", type=int, default=64,
                   help="cells per side (reference uses 200)")
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from graph_neural_network_for_radar_perception_tpu.config.config import (
        GNNConfig,
    )
    from graph_neural_network_for_radar_perception_tpu.data.grid import GridSpec
    from graph_neural_network_for_radar_perception_tpu.data.pipeline import (
        preprocess_frame_hybrid,
    )
    from graph_neural_network_for_radar_perception_tpu.data.synthetic import (
        make_synthetic_frame,
    )
    from graph_neural_network_for_radar_perception_tpu.models import cnn as CNN

    cfg = GNNConfig()
    g = args.grid
    spec = GridSpec(
        min_x=0, max_x=100, min_y=-50, max_y=50,
        dx=100 / g, dy=100 / g,
    )
    ccfg = CNN.CNNConfig()
    rng = np.random.default_rng(0)

    def batch():
        items = []
        while len(items) < args.batch_size:
            data = make_synthetic_frame(rng, num_objects=6, window_size=5)
            _, gs = preprocess_frame_hybrid(data, cfg, spec, max_meas=1024)
            items.append(gs)
        stackk = lambda k: jnp.asarray(np.stack([it[k] for it in items]))
        return (
            stackk("image"), stackk("vr"), stackk("rcs"),
            stackk("label_grid"), stackk("offset_grid"),
        )

    model, init, step, _ = CNN.make_grid_train_step(ccfg)
    b = batch()
    state = init(jax.random.key(0), b[0], b[1], b[2])
    for it in range(args.iters):
        state, m = step(state, *batch())
        if (it + 1) % max(args.iters // 10, 1) == 0:
            print(
                f"iter {it + 1}: total {float(m['loss_total']):.4f} "
                f"cls {float(m['loss_cls']):.4f} "
                f"reg {float(m['loss_reg']):.4f}"
            )


if __name__ == "__main__":
    main()
