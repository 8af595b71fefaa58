"""Train the stage-2 object classifier over proposals
(script_train_model_classifier.ipynb analog).

Run: python examples/train_classifier.py --iters 1000
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
    p.add_argument("--iters", type=int, default=1000)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--use-detector-proposals", action="store_true",
                   help="cluster with a (random-init) stage-1 detector "
                        "instead of GT clusters")
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
    from graph_neural_network_for_radar_perception_tpu.models import (
        classifier as CL,
    )

    cfg = GNNConfig(max_nodes=384, max_clusters=192, temporal_window_size=5)
    ccfg = CL.ClassifierConfig()
    ds = SyntheticRadarDataset(cfg, seed=0, num_objects=4)

    detector = None
    if args.use_detector_proposals:
        from graph_neural_network_for_radar_perception_tpu.infer.pipeline import (
            FrameDetector,
        )
        from graph_neural_network_for_radar_perception_tpu.train.steps import (
            init_params,
        )

        detector = FrameDetector(
            cfg, init_params(cfg, jax.random.key(0)),
            eps=ccfg.clustering_eps,
        )

    def sample():
        while True:
            fr = ds.sample_frame()
            if detector is not None:
                d = detector.detect_frame_arrays(fr)
                n = d.xy.shape[0]
                s = CL.build_classifier_sample(
                    d.xy, fr.node_feat[:n, 1], fr.node_class[:n],
                    d.node2cluster, d.num_clusters, ccfg,
                )
            else:
                s = CL.build_classifier_sample(
                    fr.other_feat[:, :2], fr.node_feat[:, 1],
                    fr.node_class, fr.node2cluster,
                    int(fr.cluster_class.shape[0]), ccfg,
                )
            if s is not None:
                return s

    def batch():
        ss = [sample() for _ in range(args.batch_size)]
        return CL.ClassifierSample(*[
            jnp.asarray(np.stack([getattr(s, f) for s in ss]))
            for f in CL.ClassifierSample._fields
        ])

    model, init, step, _ = CL.make_classifier_train_step(ccfg)
    state = init(jax.random.key(0), sample())
    for it in range(args.iters):
        state, m = step(state, batch())
        if (it + 1) % max(args.iters // 10, 1) == 0:
            print(
                f"iter {it + 1}: loss {float(m['loss_obj_cls']):.4f} "
                f"acc {float(m['object_accuracy']):.3f}"
            )


if __name__ == "__main__":
    main()
