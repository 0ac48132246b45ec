"""Worker for the 2-process multi-host DeviceLoader test.

Launched by tests/test_data.py::test_device_loader_two_process_assembly
as two real processes forming a jax.distributed CPU cluster (2 local
devices each -> a 4-device global mesh).  Each process feeds ONLY its
local shard rows through DeviceLoader; the loader assembles the global
batch with jax.make_array_from_process_local_data.  We verify the jitted
global mean of each batch matches the expectation computed from
DistributedSampler semantics (process p takes idx[p::2]) — which fails
if a host's rows are duplicated, dropped, or mis-placed.
"""

import os
import sys


def main() -> None:
    coord = sys.argv[1]
    pid = int(sys.argv[2])

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=2, process_id=pid
    )

    import jax.numpy as jnp
    import numpy as np

    from mudiff_tpu.data import DeviceLoader
    from mudiff_tpu.parallel import batch_sharding, make_mesh

    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, len(jax.devices())

    n = 16

    class RowValueDataset:
        """Row i is constant-valued i, shape (4,4,1)."""

        def __len__(self):
            return n

        def gather_batch(self, idx):
            x = np.asarray(idx, np.float32)[:, None, None, None] * np.ones(
                (1, 4, 4, 1), np.float32
            )
            return (x, x + 0.25, x + 0.5, x + 0.75)

    mesh = make_mesh(dp=4, fsdp=1)
    loader = DeviceLoader(
        RowValueDataset(), batch_size=4, shuffle=False, sharding=batch_sharding(mesh),
    )
    assert loader.local_batch_size == 2
    assert len(loader) == 4  # 16 rows / 4 global batch

    mean_fn = jax.jit(lambda x: jnp.mean(x))
    got = []
    for c1, c2, c3, tgt in loader.epoch(0):
        assert c1.shape == (4, 4, 4, 1), c1.shape  # GLOBAL batch shape
        got.append(
            (float(mean_fn(c1)), float(mean_fn(c2)), float(mean_fn(tgt)))
        )

    # expected: batch b holds rows {idx0[2b:2b+2]} U {idx1[2b:2b+2]}
    idx = np.arange(n)
    shards = [idx[p::2][:8] for p in range(2)]
    for b, (m1, m2, mt) in enumerate(got):
        rows = np.concatenate([shards[0][2 * b:2 * b + 2],
                               shards[1][2 * b:2 * b + 2]])
        exp = float(rows.mean())
        assert abs(m1 - exp) < 1e-5, (b, m1, exp)
        assert abs(m2 - (exp + 0.25)) < 1e-5, (b, m2, exp)
        assert abs(mt - (exp + 0.75)) < 1e-5, (b, mt, exp)

    print(f"WORKER_{pid}_OK {got}")


if __name__ == "__main__":
    main()
