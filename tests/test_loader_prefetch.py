"""datasets.loader prefetch semantics.

`device_prefetch` is the training input path's overlap mechanism
(train_det CLI + bench.py cached pipeline): the stage callable — host
batch -> device-prepared batch — must run in the prefetch thread,
preserve order, and surface stage exceptions on the consumer side
instead of hanging the queue.
"""

import threading

import pytest

from v2x_sim_tpu.datasets.loader import device_prefetch, prefetch


def test_prefetch_preserves_order_and_drains():
    src = list(range(17))
    assert list(prefetch(iter(src), depth=3)) == src


def test_device_prefetch_applies_stage_off_main_thread():
    main = threading.get_ident()
    seen_threads = set()

    def stage(x):
        seen_threads.add(threading.get_ident())
        return x * 10

    out = list(device_prefetch(iter(range(8)), stage, depth=2))
    assert out == [x * 10 for x in range(8)]
    assert main not in seen_threads  # stage ran in the prefetch thread


def test_device_prefetch_surfaces_stage_errors():
    def stage(x):
        if x == 3:
            raise ValueError("boom at 3")
        return x

    it = device_prefetch(iter(range(6)), stage, depth=2)
    got = []
    with pytest.raises(ValueError, match="boom at 3"):
        for x in it:
            got.append(x)
    assert got == [0, 1, 2]  # items before the failure were delivered


def test_cache_threaded_and_uncompressed_roundtrip(tmp_path):
    """Wire-format knobs (datasets.cache): threaded batch reads and
    uncompressed frames must reproduce the serial/compressed bytes."""
    import numpy as np

    from v2x_sim_tpu.datasets.cache import NpzCacheDataset, save_frame

    rng = np.random.default_rng(0)
    frames = [
        {"x": rng.normal(size=(3, 4)).astype(np.float32),
         "i": rng.integers(0, 9, size=(5,), dtype=np.int32)}
        for _ in range(5)
    ]
    for comp, sub in ((True, "c"), (False, "u")):
        d = str(tmp_path / sub)
        for n, f in enumerate(frames):
            save_frame(d, f"f{n:03d}", f, compress=comp)
        ds = NpzCacheDataset(d)
        serial = list(ds.batches(2, shuffle=True, seed=3, workers=0))
        threaded = list(ds.batches(2, shuffle=True, seed=3, workers=4))
        assert len(serial) == 3  # 2 + 2 + tail 1
        for a, b in zip(serial, threaded):
            for k in a:
                np.testing.assert_array_equal(a[k], b[k])
