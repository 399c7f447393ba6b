"""Probe: grouped-BSR kernel + blocked DIA SpMM on the real chip.

The BSR workload is a synthetic block-BANDED matrix built directly in the
grouped layout (a stencil expanded to (8,128) blocks is ~99% explicit
zeros — the format's target is genuinely block-dense operators, e.g.
multi-DOF FEM).  nnz counts stored block slots, the work the kernel does.
"""

import os
import sys
import time

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)

import numpy as np


def synth_grouped(n_rows, bh, bw, blocks_per_row, group, dtype=np.float32):
    from sigma_tpu.ops.bsr_pallas import GroupedBSR
    import jax
    import jax.numpy as jnp

    nbr = n_rows // bh
    nbc = n_rows // bw
    rng = np.random.default_rng(0)
    gpr = -(-blocks_per_row // group)
    n_groups = nbr * gpr
    grow = np.repeat(np.arange(nbr, dtype=np.int32), gpr)
    # banded block columns around the diagonal position
    center = (grow.astype(np.int64) * bh) // bw
    gcols = np.clip(
        center[:, None] + rng.integers(-2, 3, size=(n_groups, group)),
        0, nbc - 1,
    ).astype(np.int32)
    gdata = rng.standard_normal((n_groups, bh, group * bw)).astype(dtype)
    return GroupedBSR(
        gdata=jnp.asarray(gdata),
        gcols=jnp.asarray(gcols),
        grow=jnp.asarray(grow),
        shape=(n_rows, n_rows),
        block_shape=(bh, bw),
        group=int(group),
    )


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    print("devices:", jax.devices(), flush=True)

    from bench import laplacian_3d_coo, timeit_loop

    # --- grouped BSR kernel vs its XLA-gather fallback (same arrays)
    n = 131_072
    bh, bw, bpr, grp = 8, 128, 4, 4
    G = synth_grouped(n, bh, bw, bpr, grp)
    nnz_slots = G.gdata.size
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    t0 = time.time()
    y_kernel = np.asarray(G.matvec(x))
    print(f"bsr kernel compile+run {time.time()-t0:.0f}s", flush=True)
    # correctness vs the XLA fallback (force it)
    Xp = G._pad_x(x[:, None])
    # fallback: run the einsum path explicitly
    bhs, bws = G.block_shape
    X3 = Xp.reshape(G.nb_cols, bws, 1)
    gath = X3[G.gcols].reshape(G.gdata.shape[0], G.group * bws, 1)
    Yg = jnp.einsum("ghc,gck->ghk", G.gdata, gath)
    import jax.ops

    y_fb = np.asarray(
        jax.ops.segment_sum(Yg, G.grow, num_segments=G.nb_rows)
        .reshape(-1)[: n]
    )
    scale = np.abs(y_fb).max()
    print(
        f"bsr kernel vs XLA fallback rel err: "
        f"{np.abs(y_kernel - y_fb).max()/scale:.2e}",
        flush=True,
    )

    def mk(K):
        @jax.jit
        def f(G, x):
            def body(i, vv):
                return G.matvec(vv) * jnp.asarray(1e-3, vv.dtype)

            return lax.fori_loop(0, K, body, x)

        return f

    t = timeit_loop(mk, G, x, K1=5, K2=25)
    print(
        f"bsr grouped kernel (1M rows, {nnz_slots/1e6:.0f}M slots): "
        f"{nnz_slots/t/1e9:.1f} Gnnz/s",
        flush=True,
    )

    # XLA fallback rate on identical arrays
    def mk_fb(K):
        @jax.jit
        def f(gdata, gcols, grow, x):
            def body(i, vv):
                Xp = jnp.pad(vv, (0, G.nb_cols * bw - n))
                X3 = Xp.reshape(G.nb_cols, bw, 1)
                gath = X3[gcols].reshape(gdata.shape[0], grp * bw, 1)
                Yg = jnp.einsum("ghc,gck->ghk", gdata, gath)
                y = jax.ops.segment_sum(
                    Yg, grow, num_segments=G.nb_rows
                ).reshape(-1)[:n]
                return y * jnp.asarray(1e-3, vv.dtype)

            return lax.fori_loop(0, K, body, x)

        return f

    t_fb = timeit_loop(mk_fb, G.gdata, G.gcols, G.grow, x, K1=2, K2=10)
    print(
        f"bsr XLA block-gather (same arrays): {nnz_slots/t_fb/1e9:.2f} Gnnz/s",
        flush=True,
    )

    # --- blocked DIA SpMM at the north-star size
    nx = 216
    n2, r, c, v = laplacian_3d_coo(nx)
    nnz = r.size
    from sigma_tpu import DIAMatrix

    Ad = DIAMatrix.from_coo(n2, n2, r, c, v, dtype=jnp.float32)
    for k in (4, 8):
        X = jnp.ones((n2, k), jnp.float32)

        def mkm(K):
            @jax.jit
            def f(A, X):
                def body(i, V):
                    return A.matmat(V) * jnp.asarray(0.1, V.dtype)

                return lax.fori_loop(0, K, body, X)

            return f

        t = timeit_loop(mkm, Ad, X, K1=5, K2=25)
        print(
            f"dia spmm nx=216 k={k}: {k*nnz/t/1e9:.1f} Gnnz/s effective "
            f"({nnz/t/1e9:.1f} per-sweep)",
            flush=True,
        )
    # SpMM correctness on hardware vs per-column SpMV
    nx = 100
    n3, r, c, v = laplacian_3d_coo(nx)
    Am = DIAMatrix.from_coo(n3, n3, r, c, v, dtype=jnp.float32)
    rng2 = np.random.default_rng(2)
    Xs = jnp.asarray(rng2.standard_normal((n3, 4)).astype(np.float32))
    Ym = np.asarray(Am.matmat(Xs))
    Yv = np.stack([np.asarray(Am.matvec(Xs[:, j])) for j in range(4)], axis=1)
    print("spmm vs spmv max diff:", np.abs(Ym - Yv).max(), flush=True)


if __name__ == "__main__":
    main()
