"""Render detection panels for a sequence of frames and assemble a GIF
(viz_results.ipynb / save_predictions_and_gt.ipynb analog).

Run: python examples/visualize.py --frames 8 --out runs/viz
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--out", default="runs/viz")
    p.add_argument("--torch-ckpt", default=None)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import matplotlib

    matplotlib.use("Agg")

    from graph_neural_network_for_radar_perception_tpu.config.config import (
        GNNConfig,
    )
    from graph_neural_network_for_radar_perception_tpu.data.pipeline import (
        SyntheticRadarDataset,
    )
    from graph_neural_network_for_radar_perception_tpu.infer.pipeline import (
        FrameDetector,
    )
    from graph_neural_network_for_radar_perception_tpu.train.steps import (
        init_params,
    )
    from graph_neural_network_for_radar_perception_tpu.viz.plots import (
        compare_pred_gt, plot_all_outputs, save_frames_as_gif,
    )

    cfg = GNNConfig(max_nodes=512, max_clusters=256, temporal_window_size=5)
    params = init_params(cfg, jax.random.key(0))
    if args.torch_ckpt:
        from graph_neural_network_for_radar_perception_tpu.utils.torch_import import (
            load_reference_checkpoint,
        )

        params = load_reference_checkpoint(params, args.torch_ckpt)

    os.makedirs(args.out, exist_ok=True)
    det = FrameDetector(cfg, params, eps=1.4)
    ds = SyntheticRadarDataset(cfg, seed=42, num_objects=4)

    figs = []
    for i in range(args.frames):
        d = det.detect_frame_arrays(ds.sample_frame())
        fig = plot_all_outputs(d, figsize=(12, 12))
        fig.savefig(os.path.join(args.out, f"frame_{i:03d}.png"), dpi=90)
        figs.append(fig)
        print(f"frame {i}: {d.num_clusters} clusters")
    gif = save_frames_as_gif(figs, os.path.join(args.out, "frames.gif"))
    print(f"wrote {gif}")


if __name__ == "__main__":
    main()
