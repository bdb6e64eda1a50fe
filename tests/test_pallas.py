"""Pallas pack kernel vs the XLA path (interpret mode on CPU)."""

import numpy as np

import jax.numpy as jnp

from signature_kmers_tpu.ops.kmer_pack import pack_call_windows
from signature_kmers_tpu.ops.pallas_pack import pack_call_windows_pallas


def test_pallas_pack_matches_xla():
    rng = np.random.default_rng(0)
    B, L = 256, 384
    codes = rng.integers(0, 64, (B, L)).astype(np.uint8)
    lens = rng.integers(0, L, B).astype(np.int32)
    h1, l1, v1 = pack_call_windows_pallas(jnp.asarray(codes),
                                          jnp.asarray(lens))
    h2, l2, v2 = pack_call_windows(jnp.asarray(codes), jnp.asarray(lens))
    m = np.asarray(v2)
    np.testing.assert_array_equal(np.asarray(v1), m)
    np.testing.assert_array_equal(np.asarray(h1)[m], np.asarray(h2)[m])
    np.testing.assert_array_equal(np.asarray(l1)[m], np.asarray(l2)[m])


def test_pallas_pack_real_sequences():
    from signature_kmers_tpu.core import alphabet

    rng = np.random.default_rng(1)
    aa = alphabet.encode_seq(alphabet.AA20 + "*X" + "x")
    B, L = 256, 128
    codes = aa[rng.integers(0, aa.shape[0], (B, L))].astype(np.uint8)
    lens = np.full(B, 100, np.int32)
    h1, l1, v1 = pack_call_windows_pallas(jnp.asarray(codes),
                                          jnp.asarray(lens))
    h2, l2, v2 = pack_call_windows(jnp.asarray(codes), jnp.asarray(lens))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
