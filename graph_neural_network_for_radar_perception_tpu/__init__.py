"""TPU-native graph neural network framework for radar perception.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
UditBhaskar19/GRAPH_NEURAL_NETWORK_FOR_RADAR_PERCEPTION: multi-task
message-passing GNN over radar point clouds (node segmentation, cluster-center
offset regression, link prediction, per-cluster object classification), with a
static-shape padded graph representation, segment-scatter kernels, on-device
DBSCAN, and pjit/shard_map parallelism over TPU meshes.

The package is organised as:
  core/      static-shape graph containers (pytrees)
  ops/       TPU compute primitives: segment scatter, norms, graph build,
             connected components, Pallas kernels
  models/    flax modules: encoders, message passing, task heads, full models
  data/      host data plane: RadarScenes IO, SE(2) ego compensation,
             stationary gating, feature/label computation, batching, synthetic
  train/     losses, train state, training/finetuning loops
  infer/     clustering, proposals, frame pipeline
  eval/      segmentation & detection metrics
  parallel/  mesh construction, sharded train steps, edge partitioning
  utils/     metrics writer, checkpointing, profiling
  viz/       matplotlib visualisation
"""

__version__ = "0.1.0"
