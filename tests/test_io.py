"""IO tests: DAVIS parsing (native + numpy paths), replayer ordering,
window batching. Uses tiny generated fixtures in the reference's text
formats (the golden-fixture style of `davis240c_reader_test.cpp:19-124` and
the recorder-fake style of `replayer_test.cpp:9-125`)."""

import os

import numpy as np
import pytest

from evo_tpu.core.types import EventBatch
from evo_tpu.io import davis, replay


@pytest.fixture
def tiny_dataset(tmp_path):
    """Write a miniature DAVIS240C dataset: 6 events, 3 frames, 2 GT poses."""
    root = tmp_path / "ds"
    root.mkdir()
    (root / "events.txt").write_text(
        "0.000001 33 39 1\n"
        "0.000002 158 145 0\n"
        "0.010000 10 20 1\n"
        "0.020000 30 40 0\n"
        "0.030000 50 60 1\n"
        "0.045000 70 80 1\n"
    )
    # 3 tiny PNG frames
    from PIL import Image

    frames_dir = root / "images"
    frames_dir.mkdir()
    rng = np.random.default_rng(7)
    lines = []
    for i, t in enumerate([0.005, 0.025, 0.050]):
        arr = (rng.random((4, 5)) * 255).astype(np.uint8)
        name = f"images/frame_{i:08d}.png"
        Image.fromarray(arr, mode="L").save(root / name)
        lines.append(f"{t} {name}\n")
    (root / "images.txt").write_text("".join(lines))
    (root / "groundtruth.txt").write_text(
        "0.00 1.0 2.0 3.0 0.0 0.0 0.0 1.0\n"
        "0.10 2.0 3.0 4.0 0.0 0.0 0.0 1.0\n"
    )
    (root / "calib.txt").write_text(
        "199.092366542 198.82882047 132.192071378 110.712660011 "
        "-0.368436311798 0.150947243557 -0.000296130534385 "
        "-0.000759431726241 0.0\n"
    )
    return str(root)


def test_parse_events_numpy_vs_native(tiny_dataset):
    path = os.path.join(tiny_dataset, "events.txt")
    ev_np = davis._parse_events_numpy(path)
    assert len(ev_np) == 6
    np.testing.assert_array_equal(ev_np.t_us[:3], [1, 2, 10000])
    np.testing.assert_array_equal(ev_np.x[:2], [33, 158])
    np.testing.assert_array_equal(ev_np.p, [1, -1, 1, -1, 1, 1])
    ev_nat = davis._parse_events_native(path)
    if ev_nat is not None:  # native toolchain available
        np.testing.assert_array_equal(ev_nat.t_us, ev_np.t_us)
        np.testing.assert_array_equal(ev_nat.x, ev_np.x)
        np.testing.assert_array_equal(ev_nat.y, ev_np.y)
        np.testing.assert_array_equal(ev_nat.p, ev_np.p)


def test_native_parser_builds():
    from evo_tpu import native

    assert native.load() is not None, "native parser must build in this image"


def test_parse_calib(tiny_dataset):
    calib = davis.parse_calib(os.path.join(tiny_dataset, "calib.txt"))
    assert calib.fx == pytest.approx(199.092366542)
    assert calib.k2 == pytest.approx(0.150947243557)


def test_parse_groundtruth(tiny_dataset):
    t_us, poses = davis.parse_groundtruth(os.path.join(tiny_dataset, "groundtruth.txt"))
    np.testing.assert_array_equal(t_us, [0, 100000])
    # layout (qw, qx, qy, qz, tx, ty, tz)
    np.testing.assert_allclose(poses[0], [1, 0, 0, 0, 1.0, 2.0, 3.0])


def test_dataset_and_replayer_ordering(tiny_dataset):
    ds = davis.Davis240cDataset(tiny_dataset)
    assert len(ds.events) == 6
    assert ds.num_images == 3
    r = replay.Replayer(ds)
    log = []  # recorder fake, as in replayer_test.cpp:9-32
    r.add_event_callback(lambda t, x, y, p: log.append(("e", t)))
    r.add_image_callback(lambda t, img: log.append(("i", t)))
    while not r.finished():
        r.next()
    times = [t for _, t in log]
    assert times == sorted(times)
    # finished() is true once either stream is exhausted (replayer.cpp:42-45),
    # so the final image at t=50000 is never emitted — same as the reference.
    expect = [
        ("e", 1), ("e", 2), ("i", 5000), ("e", 10000), ("e", 20000),
        ("i", 25000), ("e", 30000), ("e", 45000),
    ]
    assert log == expect


def test_replayer_next_image(tiny_dataset):
    ds = davis.Davis240cDataset(tiny_dataset)
    r = replay.Replayer(ds)
    log = []
    r.add_event_callback(lambda t, x, y, p: log.append(("e", t)))
    r.add_image_callback(lambda t, img: log.append(("i", t)))
    r.next_image()
    assert log == [("e", 1), ("e", 2), ("i", 5000)]
    r.reset()
    log.clear()
    r.next_interval(30000)
    # everything with t < 1 + 30000 (first head is the event at t=1)
    assert log == [
        ("e", 1), ("e", 2), ("i", 5000), ("e", 10000),
        ("e", 20000), ("i", 25000), ("e", 30000),
    ]


def test_frame_windows(tiny_dataset):
    ds = davis.Davis240cDataset(tiny_dataset)
    wins = list(replay.FrameWindowIterator(ds))
    assert len(wins) == 3
    # frame 0 at t=5000: events 1, 2
    np.testing.assert_array_equal(wins[0].events.t_us, [1, 2])
    # frame 1 at t=25000: events 10000, 20000
    np.testing.assert_array_equal(wins[1].events.t_us, [10000, 20000])
    # frame 2 at t=50000: events 30000, 45000
    np.testing.assert_array_equal(wins[2].events.t_us, [30000, 45000])
    assert wins[1].image.shape == (4, 5)


def test_cut_subwindows():
    t = np.array([0, 10, 20, 400_000, 400_001, 400_002, 800_000], np.int64)
    ev = davis.EventArrays(t, np.zeros(7, np.int16), np.zeros(7, np.int16), np.ones(7, np.int8))
    # duration cap splits at the 300ms boundary
    wins = replay.cut_subwindows(ev, max_events=15000, max_duration_us=300_000)
    assert wins == [(0, 3), (3, 6), (6, 7)]
    # count cap
    wins = replay.cut_subwindows(ev, max_events=2, max_duration_us=10_000_000)
    assert wins == [(0, 2), (2, 4), (4, 6), (6, 7)]


def test_event_batch_padding():
    t_us = np.array([100, 200, 300], np.int64)
    b = EventBatch.from_numpy(
        t_us, np.array([1, 2, 3]), np.array([4, 5, 6]), np.array([1, -1, 1]), capacity=8
    )
    assert b.capacity == 8
    assert int(b.count) == 3
    np.testing.assert_array_equal(np.asarray(b.mask()), [1, 1, 1, 0, 0, 0, 0, 0])
    np.testing.assert_allclose(np.asarray(b.t[:3]), [0.0, 1e-4, 2e-4], atol=1e-9)


def test_interpolate_gt(tiny_dataset):
    ds = davis.Davis240cDataset(tiny_dataset)
    mid = replay.interpolate_gt(ds.gt_t_us, ds.gt_poses, 50000)
    np.testing.assert_allclose(mid[4:7], [1.5, 2.5, 3.5], atol=1e-5)
    exact = replay.interpolate_gt(ds.gt_t_us, ds.gt_poses, 0)
    np.testing.assert_allclose(exact[4:7], [1.0, 2.0, 3.0], atol=1e-7)
    assert replay.interpolate_gt(ds.gt_t_us, ds.gt_poses, 200000) is None
