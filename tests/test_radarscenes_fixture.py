"""Real-data hardening: schema-frozen RadarScenes fixture + field-for-field
parity of our HDF5 windowed extraction against the REFERENCE's own
`extract_and_sync_radar_data` / `extract_frame` run as an oracle
(/root/reference/modules/data_utils/read_data.py:227-303,442-486) on the
same fixture.  This pins multi-sensor window sync, mount handling,
stationary gating, and ego compensation bit-for-bit."""

import os
import sys

import numpy as np
import pytest

from graph_neural_network_for_radar_perception_tpu.config.config import (
    tiny_test_config,
)
from graph_neural_network_for_radar_perception_tpu.data.radarscenes import (
    RadarScenesDataset, SequenceCache, build_metadata, train_val_test_split,
)

from fixtures_radarscenes import make_mini_radarscenes

WINDOW = 5
DATA_DICT_FIELDS = [
    "meas_px", "meas_py", "meas_vx", "meas_vy", "meas_vr", "meas_rcs",
    "meas_timestamp", "meas_trackid", "meas_sensorid",
    "stationary_meas_flag", "meas_label_id",
]


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("radarscenes"))
    make_mini_radarscenes(root, seed=42)
    return root


@pytest.fixture(scope="module")
def reference():
    sys.path.insert(0, "/root/reference")
    from modules.data_utils import read_data

    yield read_data
    sys.path.remove("/root/reference")


def test_vendored_package_can_read_fixture(fixture_root):
    """The fixture satisfies the vendored package's Sequence contract —
    the schema-frozen guarantee (sequence.py:8-161)."""
    sys.path.insert(
        0, "/root/reference/dataset/radar_scenes"
    )
    try:
        from radar_scenes.sequence import Sequence
    except Exception:
        pytest.skip("vendored package not importable (missing deps)")
    finally:
        sys.path.remove("/root/reference/dataset/radar_scenes")
    seq = Sequence.from_json(
        os.path.join(fixture_root, "data", "sequence_1", "scenes.json")
    )
    assert len(seq) == 24
    scene = seq.get_scene(seq.first_timestamp)
    assert scene.sensor_id in (1, 2, 3, 4)
    assert scene.radar_data["x_cc"].size > 0
    nxt = seq.next_timestamp_after(seq.first_timestamp, same_sensor=True)
    assert seq.get_scene(nxt).sensor_id == scene.sensor_id


def test_window_metadata_matches_reference(fixture_root, reference):
    """Scene walk + sliding windows == reference get_sequence_data
    (multi-sensor sync order, read_data.py:164-224,416-439)."""
    windows_ref, _, radar_ref, odo_ref = reference.get_sequence_data(
        fixture_root, "data", "sequence_1", WINDOW
    )
    cache = SequenceCache(fixture_root, "data")
    windows_ours = cache.windows("sequence_1", WINDOW)
    assert len(windows_ours) == len(windows_ref)
    for wo, wr in zip(windows_ours, windows_ref):
        assert list(wo["current_timestamps"]) == list(wr["current_timestamps"])
        assert list(wo["radar_id"]) == list(wr["radar_id"])
        assert list(wo["odometry_index"]) == list(wr["odometry_index"])
        assert [list(x) for x in wo["radar_data_indices"]] == [
            list(x) for x in wr["radar_data_indices"]
        ]


@pytest.mark.parametrize("idx", [0, 7, 19])
def test_data_dict_bitmatches_reference(fixture_root, reference, idx):
    """All 11 data_dict fields bit-match reference extract_frame on the
    fixture (the round-3 'done' criterion for real-data hardening)."""
    windows_ref, mounts, radar_ref, odo_ref = reference.get_sequence_data(
        fixture_root, "data", "sequence_1", WINDOW
    )
    ref = reference.extract_frame(
        idx, windows_ref, mounts, radar_ref, odo_ref, reject_outlier=False
    )

    cache = SequenceCache(fixture_root, "data")
    ours = cache.extract_window(
        "sequence_1", cache.windows("sequence_1", WINDOW)[idx],
        reject_outlier_by_ransac=False,
    )
    assert set(ours) == set(DATA_DICT_FIELDS) == set(ref)
    for k in DATA_DICT_FIELDS:
        a, b = np.asarray(ours[k]), np.asarray(ref[k])
        assert a.dtype == b.dtype or k == "stationary_meas_flag", k
        if a.dtype.kind in "fc":
            np.testing.assert_array_equal(a, b, err_msg=k)
        else:
            assert np.array_equal(a, b), k


def test_flip_augmentation_matches_reference(fixture_root, reference):
    """x-flip augment (read_data.py:522-524) parity through
    get_data_for_datagen."""
    windows_ref, *_ = reference.get_sequence_data(
        fixture_root, "data", "sequence_1", WINDOW
    )
    md = {"sequence_name": "sequence_1", "data": windows_ref[3]}
    ref = reference.get_data_for_datagen(
        fixture_root, "data", md, reject_outlier=False, flip_along_x=True
    )
    cache = SequenceCache(fixture_root, "data")
    ours = cache.extract_window(
        "sequence_1", cache.windows("sequence_1", WINDOW)[3],
        reject_outlier_by_ransac=False, flip_along_x=True,
    )
    for k in DATA_DICT_FIELDS:
        np.testing.assert_array_equal(
            np.asarray(ours[k]), np.asarray(ref[k]), err_msg=k
        )


def test_end_to_end_dataset_on_fixture(fixture_root):
    """RadarScenesDataset over the fixture produces trainable batches."""
    import jax
    import jax.numpy as jnp

    from graph_neural_network_for_radar_perception_tpu.train import steps as T

    cfg = tiny_test_config(batch_size=2, temporal_window_size=WINDOW)
    cache = SequenceCache(fixture_root, "data")
    meta = build_metadata(cache, ["sequence_1"], WINDOW)
    ds = RadarScenesDataset(cfg, fixture_root, meta, dataset_path="data")
    batch = next(ds.batches(2, shuffle=False))
    batch = jax.tree.map(jnp.asarray, batch)
    state = T.create_train_state(cfg, jax.random.key(0))
    step = T.make_train_step(cfg)
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss_total"]))
