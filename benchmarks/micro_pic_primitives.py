"""Microbenchmark of PIC CIC primitive implementations on the TPU.

Times (per invocation, amortized over a dependent in-jit chain) for:
  * full-width one-hot gather matmul (the current run() kernel)
  * batched windowed one-hot gather (vmapped chunks, W-cell tables)
  * batched windowed deposit + scatter fold
  * bf16-operand variants of each
  * the 11-operand 1M lax.sort
  * a plain dynamic gather (jnp.take) for reference

Per the verify notes: timings must force completion with a device->host
fetch; chains run inside one jit with a traced rep count.
"""
import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))

    n = 1 << 20          # markers
    nf = 1024            # cells
    W = 256
    chunk = 8192
    n_chunks = n // chunk
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    idx = jax.random.randint(k1, (n,), 0, nf, dtype=jnp.int32)
    idx_sorted = jnp.sort(idx)
    table = jax.random.normal(k2, (nf, 8), jnp.float32)
    vals = jax.random.normal(k2, (n, 4), jnp.float32)
    # per-chunk window bases for the sorted case
    w0 = (idx_sorted.reshape(n_chunks, chunk)[:, 0] - W // 4).clip(0, nf - W)

    def timed(fn, *args, reps=30, label=""):
        @jax.jit
        def chain(r, *a):
            def body(_, c):
                out = fn(*a, c)
                return out
            x = jnp.zeros((), jnp.float32)
            x = jax.lax.fori_loop(0, r, body, x)
            return x
        float(chain(2, *args))
        t0 = time.time(); float(chain(2, *args)); t_short = time.time() - t0
        t0 = time.time(); float(chain(2 + reps, *args)); t_long = time.time() - t0
        per = (t_long - t_short) / reps
        print(f"{label:42s} {per*1e3:9.3f} ms", flush=True)
        return per

    # 1. full-width one-hot gather (current kernel shape), f32
    def full_gather(table, idx, c):
        def body(_, ic):
            oh = jax.nn.one_hot(ic, nf, dtype=table.dtype)
            return None, oh @ table
        _, out = jax.lax.scan(body, None, idx.reshape(n_chunks, chunk))
        return out.sum() * 0 + c * 0 + out.reshape(-1, 8)[0, 0] * 1e-20 + c

    timed(full_gather, table, idx, label="full-width gather scan f32 (current)")

    # 1b. as ONE flat matmul (no chunk scan)
    def full_gather_flat(table, idx, c):
        oh = jax.nn.one_hot(idx, nf, dtype=table.dtype)
        out = oh @ table
        return out[0, 0] * 1e-20 + c

    timed(full_gather_flat, table, idx, label="full-width gather one matmul f32")

    # 1c. bf16 one-hot/table
    def full_gather_bf16(table, idx, c):
        def body(_, ic):
            oh = jax.nn.one_hot(ic, nf, dtype=jnp.bfloat16)
            return None, oh @ table.astype(jnp.bfloat16)
        _, out = jax.lax.scan(body, None, idx.reshape(n_chunks, chunk))
        return out.reshape(-1, 8)[0, 0].astype(jnp.float32) * 1e-20 + c

    timed(full_gather_bf16, table, idx, label="full-width gather scan bf16")

    # 2. batched windowed gather, f32
    def win_gather(table, idx_s, w0, c):
        tw = table[w0[:, None] + jnp.arange(W)[None, :]]      # (nc, W, 8)
        lidx = idx_s.reshape(n_chunks, chunk) - w0[:, None]
        lidx = lidx.clip(0, W - 1)
        oh = jax.nn.one_hot(lidx, W, dtype=table.dtype)       # (nc, C, W)
        out = jnp.einsum("ncw,nwe->nce", oh, tw)
        return out[0, 0, 0] * 1e-20 + c

    timed(win_gather, table, idx_sorted, w0, label=f"windowed gather batched f32 W={W}")

    def win_gather_bf16(table, idx_s, w0, c):
        tw = table[w0[:, None] + jnp.arange(W)[None, :]].astype(jnp.bfloat16)
        lidx = idx_s.reshape(n_chunks, chunk) - w0[:, None]
        lidx = lidx.clip(0, W - 1)
        oh = jax.nn.one_hot(lidx, W, dtype=jnp.bfloat16)
        out = jnp.einsum("ncw,nwe->nce", oh, tw)
        return out[0, 0, 0].astype(jnp.float32) * 1e-20 + c

    timed(win_gather_bf16, table, idx_sorted, w0,
          label=f"windowed gather batched bf16 W={W}")

    # 3. full-width deposit (current), f32
    def full_deposit(vals, idx, c):
        def body(_, args):
            ic, vc = args
            oh = jax.nn.one_hot(ic, nf, dtype=vals.dtype)
            return None, oh.T @ vc
        _, ys = jax.lax.scan(body, None,
                             (idx.reshape(n_chunks, chunk),
                              vals.reshape(n_chunks, chunk, 4)))
        return ys.sum() * 1e-20 + c

    timed(full_deposit, vals, idx, label="full-width deposit scan f32 (current)")

    # 4. windowed deposit + scatter fold, f32
    def win_deposit(vals, idx_s, w0, c):
        lidx = idx_s.reshape(n_chunks, chunk) - w0[:, None]
        lidx = lidx.clip(0, W - 1)
        oh = jax.nn.one_hot(lidx, W, dtype=vals.dtype)
        y = jnp.einsum("ncw,nce->nwe", oh, vals.reshape(n_chunks, chunk, 4))
        acc = jnp.zeros((nf + W, 4), vals.dtype)
        acc = acc.at[w0[:, None] + jnp.arange(W)[None, :]].add(y)
        return acc.sum() * 1e-20 + c

    timed(win_deposit, vals, idx_sorted, w0,
          label=f"windowed deposit + scatter fold f32 W={W}")

    # 5. the sort (11 operands, num_keys=1)
    ops = tuple(jax.random.normal(jax.random.PRNGKey(i), (n,), jnp.float32)
                for i in range(11))

    def do_sort(eta, rest, c):
        out = jax.lax.sort((eta + c,) + rest, dimension=0, num_keys=1)
        return out[0][0] * 1e-20 + c

    timed(do_sort, ops[0], ops[1:], reps=10, label="lax.sort 11 operands 1M")

    # 6. plain dynamic gather
    def take_gather(table, idx, c):
        out = jnp.take(table, idx, axis=0)
        return out[0, 0] * 1e-20 + c

    timed(take_gather, table, idx, label="jnp.take gather (nf,8) by 1M idx")

    # 7. scatter-add deposit 1M -> nf (segment_sum style)
    def scatter_deposit(vals, idx, c):
        acc = jnp.zeros((nf, 4), vals.dtype)
        acc = acc.at[idx].add(vals + c)
        return acc.sum() * 1e-20 + c

    timed(scatter_deposit, vals, idx, reps=10, label="scatter .at[].add 1M -> nf")


if __name__ == "__main__":
    main()
