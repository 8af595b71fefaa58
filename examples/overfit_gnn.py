"""Single-frame overfit sanity harness (script_overfit_gnn.ipynb analog):
drive all four losses toward zero on one frame and report accuracies.

Run: python examples/overfit_gnn.py --steps 2000
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--lr", type=float, default=0.02)
    p.add_argument("--seed", type=int, default=3)
    p.add_argument("--plot", default=None, help="save pred-vs-GT panel PNG")
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from graph_neural_network_for_radar_perception_tpu.config.config import (
        GNNConfig,
    )
    from graph_neural_network_for_radar_perception_tpu.data.pipeline import (
        SyntheticRadarDataset, pad_frame, stack_batch,
    )
    from graph_neural_network_for_radar_perception_tpu.train import steps as T

    cfg = GNNConfig(
        max_nodes=512, max_clusters=256, batch_size=1,
        learning_rate=args.lr, max_train_iter=args.steps,
        temporal_window_size=5,
    )
    ds = SyntheticRadarDataset(cfg, seed=args.seed, num_objects=4)
    fr = ds.sample_frame()
    batch = jax.tree.map(jnp.asarray, stack_batch([pad_frame(fr, cfg)]))

    state = T.create_train_state(cfg, jax.random.key(0))
    step = T.make_train_step(cfg)
    for it in range(args.steps):
        state, m = step(state, batch)
        if (it + 1) % max(args.steps // 10, 1) == 0:
            print(
                f"iter {it + 1}: total {float(m['loss_total']):.4f} "
                f"node {float(m['loss_node_cls']):.4f} "
                f"edge {float(m['loss_edge_cls']):.4f} "
                f"reg {float(m['loss_node_reg']):.4f} "
                f"obj {float(m['loss_obj_cls']):.4f} | "
                f"seg acc {float(m['segment_accuracy']):.3f} "
                f"edge acc {float(m['edge_accuracy']):.3f} "
                f"obj acc {float(m['object_accuracy']):.3f}"
            )

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        from graph_neural_network_for_radar_perception_tpu.infer.pipeline import (
            FrameDetector,
        )
        from graph_neural_network_for_radar_perception_tpu.viz.plots import (
            compare_pred_gt,
        )

        det = FrameDetector(cfg, state.params)
        fig = compare_pred_gt(det.detect_frame_arrays(fr))
        fig.savefig(args.plot, dpi=110)
        print(f"saved {args.plot}")


if __name__ == "__main__":
    main()
