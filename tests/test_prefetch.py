import numpy as np

from upnerf.data.prefetch import BatchPrefetcher


def test_prefetcher_yields_batches():
    n = 1000
    store = {
        "px": np.arange(n, dtype=np.uint16),
        "py": np.arange(n, dtype=np.uint16),
        "img_idx": np.zeros(n, np.int32),
        "rgb": np.zeros((n, 3), np.uint8),
        "inv_depth": np.ones(n, np.float16),
    }
    pf = BatchPrefetcher(store, batch_size=32, device_put=lambda b: b, seed=0)
    seen = set()
    for _ in range(5):
        b = next(pf)
        assert b["px"].shape == (32,)
        assert b["rgb"].dtype == np.float32 and b["rgb"].max() <= 1.0
        seen.update(b["px"].astype(int).tolist())
    pf.close()
    assert len(seen) > 32  # different batches differ
