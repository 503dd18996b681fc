"""Induction-retrieval language (utils/induction.py): structure of the
training batches and eval prompts. Training/accuracy itself is exercised
on the chip (benchmarks/retrieval_demo.py) — these tests pin the data
contract the trained checkpoint depends on."""

import numpy as np
import jax
import jax.numpy as jnp

from kvquant_tpu.utils.induction import (
    HAY, KEY0, NKEYS, N_NEEDLES, QUERY, QW, VL, W,
    build_retrieval_prompt, sample_batch, sample_mixed_batch,
    sample_repeat_batch,
)


def test_sample_batch_structure():
    B, T, MJ = 8, 256, 4096
    toks, pos, mask = sample_batch(jax.random.PRNGKey(0), B, T, MJ)
    toks, pos, mask = map(np.asarray, (toks, pos, mask))
    region = T - QW
    assert toks.shape == pos.shape == mask.shape == (B, T)
    # query block: [QUERY, key, v1, v2] with the key/values of a planted
    # needle (key tokens come from the dedicated disjoint alphabet); the
    # needle itself is [QUERY, key, v1, v2] — the query's marker bigram
    # appears verbatim at the needle
    assert (toks[:, region] == QUERY).all()
    qkey = toks[:, region + 1]
    assert ((qkey >= KEY0) & (qkey < KEY0 + NKEYS)).all()
    for b in range(B):
        (where,) = np.nonzero(toks[b, :region] == qkey[b])
        assert len(where) == 1  # keys are distinct per sequence
        s = where[0]
        assert toks[b, s - 1] == QUERY  # needle repeats the marker
        np.testing.assert_array_equal(
            toks[b, s + 1:s + 1 + VL], toks[b, region + 2:region + 2 + VL]
        )
    # positions: contiguous, one jump before the query block
    assert (np.diff(pos, axis=1) >= 1).all()
    assert (pos[:, region] - region < MJ).all()
    assert (pos[:, :region] == np.arange(region)).all()
    # loss mask covers exactly the answer tokens
    assert (mask.sum(1) == VL).all()
    assert mask[:, region + 2:region + 2 + VL].all()


def test_sample_repeat_batch_structure():
    B, T = 4, 128
    toks, pos, mask = sample_repeat_batch(jax.random.PRNGKey(1), B, T, 999)
    toks, pos, mask = map(np.asarray, (toks, pos, mask))
    R = T // 2
    np.testing.assert_array_equal(toks[:, :R], toks[:, R:])
    assert (toks <= QUERY).all()  # full vocab incl. keys/marker
    assert (mask.sum(1) == R - 1).all()
    assert (np.diff(pos, axis=1) >= 1).all()


def test_sample_mixed_batch_shapes():
    toks, pos, mask = sample_mixed_batch(jax.random.PRNGKey(2), 6, 64, 10)
    assert toks.shape == (6, 64)
    assert toks.dtype == jnp.int32 and pos.dtype == jnp.int32


def test_build_retrieval_prompt():
    for depth in (0.0, 0.5, 1.0):
        ids, answer = build_retrieval_prompt(2048, depth, seed=3)
        assert ids.shape == (2048,) and answer.shape == (VL,)
        assert ids[-2] == QUERY
        key = ids[-1]
        assert KEY0 <= key < KEY0 + NKEYS
        (where,) = np.nonzero(ids[:-2] == key)
        assert len(where) == 1
        s = where[0]
        assert ids[s - 1] == QUERY  # needle repeats the query marker
        np.testing.assert_array_equal(ids[s + 1:s + 1 + VL], answer)
        # distractor needles carry different keys
        n_keys = ((ids[:-2] >= KEY0) & (ids[:-2] < KEY0 + NKEYS)).sum()
        assert n_keys == N_NEEDLES


def test_sample_copy_batch_structure():
    """The planted segment appears once per half, the loss mask covers
    exactly its continuation in the jumped half, and the masked tokens
    are predictable by content matching (identical to the source)."""
    from kvquant_tpu.utils.induction import SEG_MIN, sample_copy_batch

    B, T = 4, 256
    toks, pos, mask = sample_copy_batch(jax.random.PRNGKey(0), B, T, 1000)
    toks, pos, mask = map(np.asarray, (toks, pos, mask))
    assert toks.shape == pos.shape == mask.shape == (B, T)
    R = T // 2
    for b in range(B):
        nm = int(mask[b].sum())           # Lw - 1 supervised tokens
        assert SEG_MIN - 1 <= nm <= R - 1
        lo = int(np.argmax(mask[b]))      # first masked index = s2 + 1
        s2 = lo - 1
        Lw = nm + 1
        assert s2 >= R and s2 + Lw <= T
        # mask is one contiguous run
        assert mask[b, lo:lo + nm].all() and mask[b].sum() == nm
        # second-half occurrence equals a first-half window (the source)
        seg = toks[b, s2:s2 + Lw]
        found = any(
            (toks[b, s:s + Lw] == seg).all()
            for s in range(0, R - Lw + 1)
        )
        assert found
        # positions jump between the halves, monotone within each half
        assert (np.diff(pos[b, :R]) == 1).all()
        assert (np.diff(pos[b, R:]) == 1).all()
        assert pos[b, R] >= R


def test_build_copy_prompt():
    from kvquant_tpu.utils.induction import HAY, build_copy_prompt

    ids, ans = build_copy_prompt(2048, 0.5, seed=3, prefix=16, answer=2)
    assert ids.shape == (2048,) and ans.shape == (2,)
    # the prompt suffix (query) plus the answer occurs verbatim earlier
    pat = np.concatenate([ids[-16:], ans])
    hits = [
        s for s in range(0, 2048 - 18)
        if (ids[s:s + 18] == pat).all()
    ]
    assert len(hits) == 1
    assert ids.max() < HAY


def test_sample_blocks_batch_structure():
    """Stage-2 sampler: masked run is the continuation of a segment that
    occurs verbatim in a history block; positions are monotone with
    jumps only at block boundaries."""
    from kvquant_tpu.utils.induction import SEG_MIN, sample_blocks_batch

    B, T = 4, 1024
    toks, pos, mask = sample_blocks_batch(jax.random.PRNGKey(2), B, T, 1.0)
    toks, pos, mask = map(np.asarray, (toks, pos, mask))
    H0 = 6 * 128
    for b in range(B):
        nm = int(mask[b].sum())
        assert SEG_MIN - 1 <= nm <= 127
        lo = int(np.argmax(mask[b]))
        s2, Lw = lo - 1, nm + 1
        assert s2 >= H0 and s2 + Lw <= T
        seg = toks[b, s2:s2 + Lw]
        found = any(
            (toks[b, s:s + Lw] == seg).all() for s in range(0, H0 - Lw + 1)
        )
        assert found
        # positions strictly increasing; steps > 1 only at block bounds
        dp = np.diff(pos[b])
        assert (dp >= 1).all()
        jump_at = np.nonzero(dp > 1)[0] + 1
        assert all(j % 128 == 0 and j <= H0 for j in jump_at)
