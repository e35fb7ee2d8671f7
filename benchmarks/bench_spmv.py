"""BSR Pallas SpMV throughput benchmark (BASELINE north-star metric:
nnz/s/chip).

Measured on 1x TPU v5e (f32 planes, complex arithmetic as 4 real matmuls):

  n=2048 bs=128 nnzb=146  2.39M nnz   663 us   3.6 Gnnz/s ( 29 GB/s)
  n=4096 bs=128 nnzb=562  9.21M nnz   862 us  10.7 Gnnz/s ( 86 GB/s)
  n=8192 bs=256 nnzb=562 36.83M nnz   846 us  43.5 Gnnz/s (348 GB/s)

At n=8192 the kernel beats XLA's dense matvec on the same stored data
(846 us vs 1004 us).  Throughput is grid-step-overhead-bound at small sizes
(~1.5-4.5 us/step); larger blocks amortize it.  v5e HBM peak ~819 GB/s.
"""
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      str(pathlib.Path(__file__).parent.parent / ".jax_cache"))
    import jax.numpy as jnp
    from emme_tpu.ops import sparse

    rng = np.random.default_rng(0)
    for n, bs in ((2048, 128), (4096, 128), (8192, 256)):
        nb = n // bs
        M = (rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))
             ).astype(np.complex64)
        i = np.arange(nb)
        keep = np.abs(i[:, None] - i[None, :]) <= max(1, nb // 3)
        blocks = M.reshape(nb, bs, nb, bs).transpose(0, 2, 1, 3)
        blocks[~keep] = 0
        M = blocks.transpose(0, 2, 1, 3).reshape(n, n)
        op = sparse.bsr_from_dense(M, block=bs, threshold=1e-9)
        x = jnp.asarray(rng.normal(size=n).astype(np.float32))
        xi = jnp.asarray(rng.normal(size=n).astype(np.float32))
        f = jax.jit(lambda op, a, b: sparse.bsr_matvec_pallas(
            op, a, b, interpret=False))
        out = jax.block_until_ready(f(op, x, xi))
        reps = 100
        t0 = time.time()
        for _ in range(reps):
            out = f(op, x, xi)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / reps
        bw = op.nnzb * 2 * bs * bs * 4 / dt / 1e9
        print(f"n={n} bs={bs} nnzb={op.nnzb} nnz={op.nnz/1e6:.2f}M "
              f"t={dt*1e6:.0f}us nnz/s={op.nnz/dt/1e9:.1f}G BW={bw:.0f}GB/s",
              flush=True)


if __name__ == "__main__":
    main()
