"""Whole-block megakernel (block_pair_fwd) == per-half megakernels.

Interpret-mode on CPU; eval semantics (no dropout, unit drop-path gates).
"""

import numpy as np
import jax
import jax.numpy as jnp

from cara_tpu.ops.pallas.block_pair import block_pair_fwd
from cara_tpu.ops.pallas.cp_attn_block import cp_attn_block
from cara_tpu.ops.pallas.cp_mlp import cp_mlp_block


def test_block_pair_matches_split_halves():
    b, np_, heads, dh, r, nreal = 4, 128, 4, 16, 3, 100
    e = heads * dh
    hid = 4 * e
    ks = iter(jax.random.split(jax.random.key(0), 32))
    nrm = lambda *sh: jax.random.normal(next(ks), sh) * 0.1  # noqa: E731
    x = jax.random.normal(next(ks), (b, np_, e))
    wq, bq = nrm(e, 3 * e), nrm(3 * e)
    u1, v1 = nrm(e, r), nrm(r, 3 * e)
    wp, bp = nrm(e, e), nrm(e)
    u2, v2, cb2 = nrm(e, r), nrm(r, e), nrm(e)
    ls1, lb1 = 1.0 + 0.1 * nrm(e), nrm(e)
    w1, b1 = nrm(e, hid), nrm(hid)
    mu1, mv1, mcb1 = nrm(e, r), nrm(r, hid), nrm(hid)
    w2, b2 = nrm(hid, e), nrm(e)
    mu2, mv2, mcb2 = nrm(hid, r), nrm(r, e), nrm(e)
    ls2, lb2 = 1.0 + 0.1 * nrm(e), nrm(e)
    sm = dh ** -0.5
    s = 1.3

    got = block_pair_fwd(
        x, wq, bq, u1, v1, wp, bp, u2, v2, cb2, ls1, lb1,
        w1, b1, mu1, mv1, mcb1, w2, b2, mu2, mv2, mcb2, ls2, lb2,
        heads, sm, nreal, s, 2, "gelu", 1e-6, True)

    dpm = jnp.ones((b, 1))
    xm = cp_attn_block(x, wq, bq, u1, v1, wp, bp, u2, v2, cb2, ls1, lb1,
                       dpm, heads, sm, nreal, s, 2, True)
    m = b * np_
    want = cp_mlp_block(
        xm.reshape(m, e), w1, b1, mu1, mv1, mcb1, w2, b2, mu2, mv2, mcb2,
        ls2, lb2, jnp.ones((m, 1)), s, 256, True, "gelu", 1e-6
    ).reshape(b, np_, e)

    np.testing.assert_allclose(
        np.asarray(got[:, :nreal]), np.asarray(want[:, :nreal]),
        atol=2e-4, rtol=2e-4)
