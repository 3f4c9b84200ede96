import os

import numpy as np
import pytest

from visual_odometry_tpu.native import dataloader
from visual_odometry_tpu.utils import io


@pytest.fixture(scope="module")
def native():
    if not dataloader.available():
        pytest.skip("native parser could not be built")
    return dataloader


def test_parses_meas_identically(native, reference_data_dir):
    path = os.path.join(reference_data_dir, "meas-00000.dat")
    got = native.parse_table(path, 3, 1, 14)
    ref = np.loadtxt(path, skiprows=3, usecols=range(1, 15), ndmin=2)
    np.testing.assert_allclose(got, ref)


def test_parses_world_identically(native, reference_data_dir):
    path = os.path.join(reference_data_dir, "world.dat")
    got = native.parse_table(path, 0, 0, 14)
    ref = np.loadtxt(path, usecols=range(0, 14), ndmin=2)
    assert got.shape == (1000, 14)
    np.testing.assert_allclose(got, ref)


def test_all_frames_roundtrip(native, reference_data_dir):
    for name in io.list_measurement_files(reference_data_dir)[:10]:
        path = os.path.join(reference_data_dir, name)
        got = native.parse_table(path, 3, 1, 14)
        ref = np.loadtxt(path, skiprows=3, usecols=range(1, 15), ndmin=2)
        np.testing.assert_allclose(got, ref, err_msg=name)


def test_missing_file(native):
    assert native.parse_table("/nonexistent/file.dat", 0, 0, 3) is None


def test_blank_and_short_lines(native, tmp_path):
    p = tmp_path / "t.dat"
    p.write_text("hdr\n1 2 3\n\n4 5 6\nshort\n7 8 9\n")
    got = native.parse_table(str(p), 1, 0, 3)
    np.testing.assert_allclose(got, [[1, 2, 3], [4, 5, 6], [7, 8, 9]])


def test_io_layer_uses_native(native, reference_data_dir):
    # The io facade should produce identical results whichever path it took.
    f = io.load_measurements(os.path.join(reference_data_dir, "meas-00003.dat"))
    ref = np.loadtxt(
        os.path.join(reference_data_dir, "meas-00003.dat"),
        skiprows=3,
        usecols=range(1, 15),
        ndmin=2,
    )
    np.testing.assert_allclose(f.points, ref[:, 2:4].astype(np.float32))
    np.testing.assert_array_equal(f.ids, ref[:, 1].astype(np.int32))


def test_native_sequence_loader_bit_identical(reference_data_dir):
    """vo_load_sequence (threaded C++ parse+pad) == the Python
    load_measurements/pad_frames path, bit for bit, every array."""
    from visual_odometry_tpu.native import dataloader
    from visual_odometry_tpu.utils import io

    if not dataloader.available():
        pytest.skip("native library unavailable")
    out = dataloader.load_sequence_native(
        reference_data_dir, 128, io.PAD_APPEARANCE
    )
    assert out is not None
    points, apps, ids, mask, counts = out

    files = io.list_measurement_files(reference_data_dir)
    frames = [
        io.load_measurements(os.path.join(reference_data_dir, f))
        for f in files
    ]
    ref = io.pad_frames(frames, 128)
    np.testing.assert_array_equal(points, ref.points)
    np.testing.assert_array_equal(apps, ref.appearances)
    np.testing.assert_array_equal(ids, ref.ids)
    np.testing.assert_array_equal(mask, ref.mask)
    np.testing.assert_array_equal(counts, ref.counts)


def test_native_sequence_loader_auto_slots(reference_data_dir):
    from visual_odometry_tpu.native import dataloader
    from visual_odometry_tpu.utils import io

    if not dataloader.available():
        pytest.skip("native library unavailable")
    out = dataloader.load_sequence_native(
        reference_data_dir, None, io.PAD_APPEARANCE
    )
    assert out is not None
    points = out[0]
    counts = out[4]
    assert points.shape[1] % 128 == 0
    assert points.shape[1] >= counts.max()
