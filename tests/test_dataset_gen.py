"""The synthetic dataset generator must produce a trackable dataset in the
reference format — an end-to-end self-test needing no external data."""

import os

import numpy as np
import pytest

from visual_odometry_tpu import apps
from visual_odometry_tpu.utils import dataset_gen, io


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("synth_data"))
    dataset_gen.generate_dataset(d, num_frames=40, num_landmarks=400, seed=1)
    return d


def test_format_readable(dataset):
    files = io.list_measurement_files(dataset)
    assert len(files) == 40
    params = io.load_camera_params(os.path.join(dataset, "camera.dat"))
    assert params.width == 640 and params.z_far == 5
    ids, pts, apps_ = io.load_world(os.path.join(dataset, "world.dat"))
    assert pts.shape == (400, 3)
    seq = io.load_sequence(dataset, 512)
    assert (seq.counts > 8).all(), "every frame must see enough landmarks"


def test_full_pipeline_tracks_generated_data(dataset, tmp_path):
    out = str(tmp_path)
    apps.run_vo_complete(dataset, out, verbose=False)
    res = apps.run_evaluation(dataset, out, verbose=False)
    finite = np.isfinite(res.orientation_errors)
    # Noise-free projections: tracking should be tight.
    assert np.abs(res.orientation_errors[finite]).mean() < 1e-4
    assert res.rmse_position < 0.2
    assert res.n_map_matched > 100
