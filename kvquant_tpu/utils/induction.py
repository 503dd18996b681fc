"""Induction-retrieval language + trained checkpoint: REAL long-context
retrieval measurement without egress.

The reference's needle/passkey evals score retrieval with a pretrained
long-context LLM (lwm/eval_haystack_pytorch_quant.py,
quant/eval_passkey_simquant.py). Zero egress means no such checkpoint here,
and the bigram toy (utils/toymodel.py) has no retrieval ability at all —
its needle numbers can only measure fp16 PARITY. This module closes that
gap: a synthetic key-value retrieval language whose solution REQUIRES a
long-range induction circuit, and a small LLaMA trained on it in minutes,
so the needle grid measures genuine retrieval ACCURACY through the
quantized cache (and its delta vs the fp16 cache) at 16K-64K contexts.

Language: sequences over a 500-token haystack alphabet with N_NEEDLES
planted needles ``[QUERY, key, v1, v2]`` — keys drawn WITHOUT replacement
from a dedicated 10-token key alphabet (disjoint from the haystack, so
matching is by key IDENTITY and haystack collisions are impossible) — and
a query suffix ``[QUERY, key] -> v1 v2`` naming ONE of them. The needle
REPEATS the query's marker so the (QUERY, key) bigram appears verbatim at
the needle — the induction circuit that forms on the repeated-segment
trainer matches on suffix CONTEXT, and a bare key with random haystack
left-context gives it nothing to match (measured: needle loss stuck at
chance ln(500) after 12k steps while the repeat loss fell — the round-3
format). This mirrors the reference needle evals, where the planted
sentence repeats the question's phrase verbatim (lwm needle / passkey
prompts). Distractor needles still force key-IDENTITY matching: every
needle starts [QUERY, key_i], so the marker alone cannot disambiguate.

Length generalization via POSITION JUMPS: training computes only T=512
tokens, but a random gap of up to ~128K positions is inserted between the
needle region and the query block (``forward(..., positions=...)`` — RoPE
attention depends only on RELATIVE rotation, so this trains the retrieval
circuit at exactly the long distances the 64K eval exercises while paying
512 tokens of compute). Loss is masked to the answer tokens: the haystack
is uniform noise and carries no trainable signal.

Training runs as segmented on-device ``lax.scan`` (data generated in-scan
from PRNG keys — no host round trips; segments stay under the multi-minute
single-dispatch limit noted in NOTES_ROUND2).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from ..models import ModelConfig, init_params
from ..models.llama import forward

HAY = 500          # haystack alphabet [0, HAY)
KEY0, NKEYS = 500, 10  # key alphabet [KEY0, KEY0+NKEYS), disjoint from HAY
QUERY = 511
VL = 2             # value token count
N_NEEDLES = 3      # planted needles (distinct keys; one is queried)
W = 2 + VL         # planted needle width ([QUERY, key, values])
QW = 1 + 1 + VL    # query block width ([QUERY, key, values])

IND_CFG = ModelConfig(
    vocab_size=512, d_model=256, n_layers=4, n_heads=8, n_kv_heads=4,
    d_head=32, d_ff=512, max_seq_len=131072 + 512,
    # long-context rope base: at the default theta=1e4 with d_head=32,
    # even the LOWEST-frequency band rotates ~23 rad across a 128K
    # position jump, so no content-match head can be phase-invariant at
    # retrieval distances — measured as the copy loss crawling (6.2→5.9
    # in 8k steps) while structural shortcuts win. theta=1e7 gives the
    # low bands ~0.04 rad drift over 128K (the standard long-context
    # rope-base recipe, cf. reference rope_theta plumbing in hf_loader).
    rope_theta=1e7,
)

CKPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "artifacts", "induction_model.npz",
)


def sample_batch(key, batch: int, T: int, max_jump: int):
    """One training batch, pure JAX (callable inside a device-side scan).

    Returns (tokens (B, T) int32, positions (B, T) int32, loss_mask (B, T)
    bool — True on the answer tokens of the query block only)."""
    ks = jax.random.split(key, 6)
    toks = jax.random.randint(ks[0], (batch, T), 0, HAY)
    # distinct keys per sequence: first N_NEEDLES of a permuted key alphabet
    keys = KEY0 + jax.vmap(
        lambda k: jax.random.permutation(k, NKEYS)[:N_NEEDLES]
    )(jax.random.split(ks[1], batch))  # (B, N)
    vals = jax.random.randint(ks[2], (batch, N_NEEDLES, VL), 0, HAY)

    region = T - QW                      # needles live in [0, region)
    slice_len = region // N_NEEDLES      # disjoint slice per needle
    offs = jax.random.randint(ks[3], (batch, N_NEEDLES), 0, slice_len - W)
    starts = offs + slice_len * jnp.arange(N_NEEDLES)[None, :]

    idx = jnp.arange(T)
    for n in range(N_NEEDLES):
        pattern = jnp.concatenate(
            [jnp.full((batch, 1), QUERY), keys[:, n:n + 1], vals[:, n]],
            axis=1,
        )  # (B, W)
        rel = idx[None, :] - starts[:, n:n + 1]
        inside = (rel >= 0) & (rel < W)
        gathered = jnp.take_along_axis(pattern, jnp.clip(rel, 0, W - 1), 1)
        toks = jnp.where(inside, gathered, toks)

    qi = jax.random.randint(ks[4], (batch,), 0, N_NEEDLES)
    qk = jnp.take_along_axis(keys, qi[:, None], axis=1)
    qv = jnp.take_along_axis(vals, qi[:, None, None], axis=1)[:, 0]
    qblock = jnp.concatenate(
        [jnp.full((batch, 1), QUERY), qk, qv], axis=1
    )  # (B, QW)
    toks = jnp.concatenate([toks[:, :region], qblock], axis=1)

    jump = jax.random.randint(ks[5], (batch, 1), 0, max_jump)
    positions = idx[None, :] + jnp.where(idx[None, :] >= region, jump, 0)

    loss_mask = (idx[None, :] >= region + 2) & (
        idx[None, :] < region + 2 + VL
    )
    loss_mask = jnp.broadcast_to(loss_mask, (batch, T))
    return toks.astype(jnp.int32), positions.astype(jnp.int32), loss_mask


def sample_repeat_batch(key, batch: int, T: int, max_jump: int):
    """Repeated-segment sequences: ``[segment (T/2) | jump | segment]``.

    The canonical induction trainer — the whole second half is predictable
    by suffix-match-and-copy, giving ~T/2 supervised tokens per sequence
    (the needle format alone gives 2, which measured as NO circuit
    formation in 2000 steps at any T: nothing pressures the precursor
    previous-token heads into existence). The position jump between the
    halves trains the copy attention at long relative distances. Loss mask
    covers the second half except its first token (seg[0] is not
    predictable — nothing marks the repetition start).

    Segments draw from the FULL vocab (incl. the key alphabet and the
    QUERY marker), not just the haystack: the induction circuit matches on
    token embeddings, and key/marker embeddings that never occur in the
    copy data stay untrained — measured as the needle half stuck at chance
    (ln 500) after 12k steps while the repeat loss fell, in BOTH needle
    formats (with and without the marker bigram)."""
    ks = jax.random.split(key, 2)
    R = T // 2
    seg = jax.random.randint(ks[0], (batch, R), 0, QUERY + 1)
    toks = jnp.concatenate([seg, seg], axis=1)
    idx = jnp.arange(T)
    jump = jax.random.randint(ks[1], (batch, 1), 0, max_jump)
    positions = idx[None, :] + jnp.where(idx[None, :] >= R, jump, 0)
    loss_mask = jnp.broadcast_to(idx[None, :] >= R + 1, (batch, T))
    return toks.astype(jnp.int32), positions.astype(jnp.int32), loss_mask


SEG_LEN = 48       # nominal segment length (eval probes use <= this)
SEG_MIN = 8        # shortest trained copy segment


def sample_copy_batch(key, batch: int, T: int, max_jump: int,
                      difficulty=1.0):
    """Noise-embedded segment copy with a CONTINUOUS difficulty knob: an
    Lw-token segment planted in the first half reappears in the jumped
    second half; loss covers the reappearance's continuation (Lw-1
    supervised tokens).

    ``difficulty`` d ∈ [0, 1] (traced scalar OK) interpolates from the
    full-repeat task — Lw = T/2, source at 0, copy at T/2: the one
    format that reliably BOOTSTRAPS a copy circuit — to the full
    noise-embedded mixture: Lw ~ U[SEG_MIN, T/2], source and copy at
    random offsets. The anneal is the round-5 finding that made the
    retrieval checkpoint trainable at all (NOTES_ROUND5): every
    cold-start on the hard task flatlines at chance (pure-noise copy has
    no partial-credit gradient until the full two-hop circuit exists),
    and every FIXED mixture containing repeat instances lets the model
    keep a repeat-specific structural shortcut; gradually randomizing
    the alignment of an already-solved repeat task instead forces the
    existing match head to become content-addressed."""
    ks = jax.random.split(key, 6)
    R = T // 2
    d = jnp.float32(difficulty)
    toks = jax.random.randint(ks[0], (batch, T), 0, HAY)
    seg = jax.random.randint(ks[1], (batch, R), 0, HAY)
    # Lw ~ U[lw_min(d), R] with lw_min: R -> SEG_MIN
    lw_min = jnp.round(R - d * (R - SEG_MIN)).astype(jnp.int32)
    u = jax.random.uniform(ks[2], (batch, 1))
    Lw = lw_min + jnp.floor(u * (R - lw_min + 1)).astype(jnp.int32)
    # start offsets ~ U[0, d * (R - Lw)]
    u1 = jax.random.uniform(ks[3], (batch, 1))
    s1 = jnp.floor(u1 * (d * (R - Lw) + 1)).astype(jnp.int32)
    u2 = jax.random.uniform(ks[4], (batch, 1))
    s2 = R + jnp.floor(u2 * (d * (R - Lw) + 1)).astype(jnp.int32)
    idx = jnp.arange(T)

    def plant(toks, start):
        rel = idx[None, :] - start
        inside = (rel >= 0) & (rel < Lw)
        gathered = jnp.take_along_axis(seg, jnp.clip(rel, 0, R - 1), 1)
        return jnp.where(inside, gathered, toks)

    toks = plant(plant(toks, s1), s2)
    jump = jax.random.randint(ks[5], (batch, 1), 0, max_jump)
    positions = idx[None, :] + jnp.where(idx[None, :] >= R, jump, 0)
    rel2 = idx[None, :] - s2
    loss_mask = (rel2 >= 1) & (rel2 < Lw)
    return toks.astype(jnp.int32), positions.astype(jnp.int32), loss_mask


def sample_mixed_batch(key, batch: int, T: int, max_jump: int,
                       difficulty=1.0):
    """Annealed noise-embedded copy (see sample_copy_batch).

    Round-4/5 history: repeat + [QUERY, key] needle (round 4) left the
    needle at chance behind a 128:1 supervision imbalance; repeat +
    fixed-length copy left the copy component at chance for 6.5k steps;
    cold-starting the variable-length copy task flatlined at chance on
    two model scales — the difficulty anneal is what works."""
    return sample_copy_batch(key, batch, T, max_jump, difficulty)


def sample_blocks_batch(key, batch: int, T: int, difficulty=1.0):
    """Stage-2 curriculum: multi-block jumped history. The first
    NB_BLOCKS*BLOCK tokens are history blocks separated by independent
    position jumps (half zero — contiguous real runs — half ~U[0, 16K]);
    an Lw-token segment planted in a RANDOM history block reappears in
    the query region (the last T - NB_BLOCKS*BLOCK tokens).

    Why a second stage (NOTES_ROUND5): the stage-1 (single-jump)
    checkpoint retrieves perfectly when the source lies within the first
    ~T/2 REAL tokens but collapses beyond (0/8 at 2048-token depth 0.5)
    — layer-1 source features only generalize to the real context depth
    seen in training. Varying the number, spacing, and reality of
    source-context blocks fixes that: fine-tuning on this distribution
    took 2048-depth-0.5 from 0/8 to 8/8 and holds 6-7/8 at 16K full
    depth. Cold-starting on THIS distribution flatlines at chance —
    warm-starting from stage 1 is required."""
    NB_BLOCKS, BLOCK = 6, 128
    H0 = NB_BLOCKS * BLOCK
    QH = T - H0
    assert QH >= 64, (T, H0)
    d = jnp.float32(difficulty)
    ks = jax.random.split(key, 9)
    toks = jax.random.randint(ks[0], (batch, T), 0, HAY)
    seg = jax.random.randint(ks[1], (batch, BLOCK), 0, HAY)
    # source block: d=0 -> last history block; d=1 -> uniform
    u_blk = jax.random.uniform(ks[2], (batch, 1))
    blk = jnp.where(
        jax.random.uniform(ks[3], (batch, 1)) < d,
        jnp.floor(u_blk * NB_BLOCKS), jnp.float32(NB_BLOCKS - 1)
    ).astype(jnp.int32)
    lw_min = jnp.round(BLOCK - d * (BLOCK - SEG_MIN)).astype(jnp.int32)
    u = jax.random.uniform(ks[4], (batch, 1))
    Lw = lw_min + jnp.floor(u * (BLOCK - lw_min + 1)).astype(jnp.int32)
    u1 = jax.random.uniform(ks[5], (batch, 1))
    s1 = blk * BLOCK + jnp.floor(u1 * (d * (BLOCK - Lw) + 1)).astype(jnp.int32)
    u2 = jax.random.uniform(ks[6], (batch, 1))
    s2 = H0 + jnp.floor(u2 * (d * (QH - Lw) + 1)).astype(jnp.int32)
    idx = jnp.arange(T)

    def plant(toks, start):
        rel = idx[None, :] - start
        inside = (rel >= 0) & (rel < Lw)
        g = jnp.take_along_axis(seg, jnp.clip(rel, 0, BLOCK - 1), 1)
        return jnp.where(inside, g, toks)

    toks = plant(plant(toks, s1), s2)
    jz = jax.random.randint(ks[7], (batch, NB_BLOCKS), 0, 16384)
    jmask = jax.random.uniform(ks[8], (batch, NB_BLOCKS)) < 0.5
    jumps = jnp.where(jmask, jz, 0)
    bnd = (jnp.arange(NB_BLOCKS)[None, :, None] + 1) * BLOCK
    positions = idx[None, :] + jnp.sum(
        jnp.where(idx[None, None, :] >= bnd, jumps[:, :, None], 0), axis=1
    )
    rel2 = idx[None, :] - s2
    loss_mask = (rel2 >= 1) & (rel2 < Lw)
    return toks.astype(jnp.int32), positions.astype(jnp.int32), loss_mask


def masked_loss(params, cfg: ModelConfig, toks, positions, mask):
    """Cross-entropy on masked label positions only (the haystack is
    uniform noise — training on it would only burn capacity)."""
    logits, _ = forward(params, cfg, toks, positions=positions)
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = toks[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    m = mask[:, 1:].astype(jnp.float32)
    return (nll * m).sum() / jnp.maximum(m.sum(), 1.0)


def train_induction_model(
    cfg: ModelConfig = IND_CFG,
    # 16000 steps with the difficulty anneal reaches full-difficulty
    # masked loss ~0.007 on this shape (round-5 diagnostic D); every
    # cold start at fixed difficulty flatlined at chance
    steps: int = 16000,
    batch: int = 32,
    seq_len: int = 512,
    max_jump: int = 131072,
    lr: float = 1e-3,
    seed: int = 0,
    segment: int = 250,
    log=print,
):
    """Train the retrieval checkpoint. Device-side scan in ``segment``-step
    chunks (single multi-minute dispatches can kill the remote worker —
    NOTES_ROUND2). Returns (params, final masked loss)."""
    import optax

    params = init_params(jax.random.PRNGKey(seed), cfg, dtype=jnp.float32)
    opt = optax.adam(lr)
    state = opt.init(params)

    # SINGLE-step jit + host loop, NOT a scanned segment: through the axon
    # tunnel the remote compile of even the single fwd+bwd step measures
    # ~8 minutes (scan-of-steps far worse — the round-3 segment trainer
    # never got out of its first compile), while dispatch is async and
    # cheap (20 chained steps measured 29 ms/step end-to-end). One compile
    # + the host dispatches ≈ minutes of device time total.
    @jax.jit
    def one_step(params, state, key, d):
        toks, pos, mask = sample_mixed_batch(
            key, batch, seq_len, max_jump, d
        )
        loss, g = jax.value_and_grad(masked_loss)(
            params, cfg, toks, pos, mask
        )
        upd, state = opt.update(g, state)
        return optax.apply_updates(params, upd), state, loss

    @jax.jit
    def hard_loss(params, key):
        # loss at FULL difficulty — the distribution the eval draws from;
        # logging the training loss alone hid two curriculum failures
        # (NOTES_ROUND5)
        toks, pos, mask = sample_copy_batch(
            key, batch, seq_len, max_jump, 1.0
        )
        return masked_loss(params, cfg, toks, pos, mask)

    # difficulty anneal: repeat task for the first 1/8 of training, ramp
    # to the full noise-embedded mixture by 5/8, hold
    ramp0, ramp1 = steps // 8, 5 * steps // 8

    loss = float("nan")
    for s in range(steps):
        d = min(max((s - ramp0) / max(ramp1 - ramp0, 1), 0.0), 1.0)
        params, state, loss_d = one_step(
            params, state, jax.random.PRNGKey(1000 + s), jnp.float32(d)
        )
        if (s + 1) % segment == 0 or s + 1 == steps:
            loss = float(loss_d)
            lc = float(hard_loss(params, jax.random.PRNGKey(17 + s)))
            log(f"[induction] stage1 step {s + 1} d={d:.2f}: masked loss "
                f"{loss:.4f} (full-difficulty {lc:.4f})")

    # ---- stage 2: multi-block jumped history (source-depth
    # generalization; see sample_blocks_batch). Warm-start is REQUIRED —
    # cold starts on this distribution flatline at chance. ----
    steps2 = steps * 5 // 8
    T2 = seq_len * 2
    B2 = max(batch // 2, 1)
    state = opt.init(params)  # fresh optimizer state for the new task

    @jax.jit
    def one_step2(params, state, key, d):
        toks, pos, mask = sample_blocks_batch(key, B2, T2, d)
        loss, g = jax.value_and_grad(masked_loss)(
            params, cfg, toks, pos, mask
        )
        upd, state = opt.update(g, state)
        return optax.apply_updates(params, upd), state, loss

    r0, r1 = steps2 // 20, 7 * steps2 // 20
    for s in range(steps2):
        d = min(max((s - r0) / max(r1 - r0, 1), 0.0), 1.0)
        params, state, loss_d = one_step2(
            params, state, jax.random.PRNGKey(10 ** 6 + s), jnp.float32(d)
        )
        if (s + 1) % segment == 0 or s + 1 == steps2:
            loss = float(loss_d)
            log(f"[induction] stage2 step {s + 1} d={d:.2f}: masked loss "
                f"{loss:.4f}")
    return params, loss


def sample_long_batch(key, batch: int, T: int, qz: int = 256,
                      max_jump: int = 131072, seg_max: int = 128):
    """Stage-3 curriculum: LONG real context (train with chunked
    attention + forward(remat=True)). A segment (Lw ~ U[SEG_MIN,
    seg_max]) planted ANYWHERE in the first T-qz real tokens reappears
    in the last-qz query zone (position jump before it extends the
    retrieval distance to max_jump). Trains softmax-dilution robustness
    at T real keys and source features at any real depth — the stage-2
    model was still key-count-bound (1/8 deployed at 16K while 8/8 at
    2K, NOTES_ROUND5)."""
    ks = jax.random.split(key, 7)
    H0 = T - qz
    toks = jax.random.randint(ks[0], (batch, T), 0, HAY)
    seg = jax.random.randint(ks[1], (batch, seg_max), 0, HAY)
    u = jax.random.uniform(ks[2], (batch, 1))
    Lw = SEG_MIN + jnp.floor(u * (seg_max - SEG_MIN + 1)).astype(jnp.int32)
    u1 = jax.random.uniform(ks[3], (batch, 1))
    s1 = jnp.floor(u1 * (H0 - Lw + 1)).astype(jnp.int32)
    u2 = jax.random.uniform(ks[4], (batch, 1))
    s2 = H0 + jnp.floor(u2 * (qz - Lw + 1)).astype(jnp.int32)
    idx = jnp.arange(T)

    def plant(toks, start):
        rel = idx[None, :] - start
        inside = (rel >= 0) & (rel < Lw)
        g = jnp.take_along_axis(seg, jnp.clip(rel, 0, seg_max - 1), 1)
        return jnp.where(inside, g, toks)

    toks = plant(plant(toks, s1), s2)
    jump = jax.random.randint(ks[5], (batch, 1), 0, max_jump)
    positions = idx[None, :] + jnp.where(idx[None, :] >= H0, jump, 0)
    rel2 = idx[None, :] - s2
    mask = (rel2 >= 1) & (rel2 < Lw)
    return toks.astype(jnp.int32), positions.astype(jnp.int32), mask


def finetune_retrieval_robust(
    params,
    cfg: ModelConfig = IND_CFG,
    steps: int = 3000,
    long_T: int = 8192,
    k_noise: float = 0.08,
    v_noise: float = 0.05,
    lr: float = 3e-4,
    log=print,
):
    """Stages 3-5 consolidated: noise-robust long-context fine-tune.

    Injects Gaussian noise on the K/V projections (via forward's
    kv_probes hook) at quantized-cache error scale — k_noise/v_noise are
    fractions of the per-layer activation std, measured on the fly — so
    retrieval margins survive 4-bit K quantization (stage-4 measurement:
    deployed 4-bit at 2K went 4/8 → 8/8), and alternates long-real-
    context batches (sample_long_batch at long_T, trained with remat +
    chunked attention) with stage-2 blocks batches for retention."""
    import optax

    L, C = cfg.n_layers, cfg.kv_hidden

    # per-layer activation stds ground the noise scale
    toks0, pos0, _ = sample_copy_batch(
        jax.random.PRNGKey(0), 4, 512, 1000, 1.0)
    _, aux = forward(params, cfg, toks0, positions=pos0, capture_kv=True)
    kstd = jnp.asarray(aux["k_acts"]).std(axis=(1, 2, 3))
    vstd = jnp.asarray(aux["v_acts"]).std(axis=(1, 2, 3))

    opt = optax.adam(lr)
    state = opt.init(params)

    def noisy_loss(params, toks, pos, mask, key, chunk, remat):
        B, T = toks.shape
        k1, k2 = jax.random.split(key)
        probes = {
            "k": jax.random.normal(k1, (L, B, T, C))
                 * (k_noise * kstd)[:, None, None, None],
            "v": jax.random.normal(k2, (L, B, T, C))
                 * (v_noise * vstd)[:, None, None, None],
        }
        logits, _ = forward(params, cfg, toks, positions=pos,
                            kv_probes=probes, attn_chunk=chunk,
                            remat=remat)
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
        tgt = toks[:, 1:]
        nll = -jnp.take_along_axis(logp, tgt[..., None], -1)[..., 0]
        m = mask[:, 1:].astype(jnp.float32)
        return (nll * m).sum() / jnp.maximum(m.sum(), 1.0)

    @jax.jit
    def one_step(params, state, key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        t1, p1, m1 = sample_long_batch(k1, 2, long_T)
        l1, g1 = jax.value_and_grad(noisy_loss)(
            params, t1, p1, m1, k3, 1024, True)
        upd, state = opt.update(g1, state)
        params = optax.apply_updates(params, upd)
        t2, p2, m2 = sample_blocks_batch(k2, 8, 1024, 1.0)
        l2, g2 = jax.value_and_grad(noisy_loss)(
            params, t2, p2, m2, k4, None, False)
        upd, state = opt.update(g2, state)
        return optax.apply_updates(params, upd), state, (l1, l2)

    for s in range(steps):
        params, state, (l1, l2) = one_step(
            params, state, jax.random.PRNGKey(11 * 10 ** 6 + s))
        if (s + 1) % 250 == 0 or s + 1 == steps:
            log(f"[induction] robust step {s + 1}: long {float(l1):.4f} "
                f"blocks {float(l2):.4f}")
    return params


def cached_induction_model(path: str = CKPT, log=print):
    """Load (or train + save) the retrieval checkpoint."""
    from .toymodel import load_toy_checkpoint, save_toy_checkpoint

    if os.path.exists(path):
        params, loss, _ = load_toy_checkpoint(path)
        return params, loss
    params, loss = train_induction_model(log=log)
    params = finetune_retrieval_robust(params, log=log)
    save_toy_checkpoint(path, params, loss, seed=0)
    return params, loss


# ---------------------------------------------------------------------------
# evaluation prompts
# ---------------------------------------------------------------------------


def build_retrieval_prompt(ctx: int, depth: float, seed: int):
    """A ctx-token haystack with the QUERIED needle at ``depth`` in [0, 1]
    and N_NEEDLES-1 distractors at other depths, ending in the query block
    [QUERY, key]. Each planted needle is [QUERY, key, v1, v2] — the query's
    marker bigram appears verbatim at the needle (see module docstring).
    Returns (ids (ctx,) int32, answer (VL,) int32): the model must emit
    the VL value tokens greedily."""
    r = np.random.default_rng(seed)
    ids = r.integers(0, HAY, size=ctx).astype(np.int32)
    keys = KEY0 + r.permutation(NKEYS)[:N_NEEDLES]
    vals = r.integers(0, HAY, size=(N_NEEDLES, VL))

    region = ctx - 2  # prompt ends after [QUERY, key]
    starts = [int(depth * (region - W))]
    while len(starts) < N_NEEDLES:
        s = int(r.integers(0, region - W))
        if all(abs(s - t) >= W for t in starts):
            starts.append(s)
    for n, s in enumerate(starts):
        ids[s] = QUERY
        ids[s + 1] = keys[n]
        ids[s + 2:s + W] = vals[n]
    ids[region] = QUERY
    ids[region + 1] = keys[0]
    return ids, vals[0].astype(np.int32)


def build_copy_prompt(ctx: int, depth: float, seed: int,
                      prefix: int = 16, answer: int = VL):
    """Segment-copy retrieval prompt (the format sample_copy_batch
    trains): a (prefix+answer)-token segment planted at ``depth`` in a
    ctx-token haystack, with the prompt ending in the segment's first
    ``prefix`` tokens — the model must greedily emit the next ``answer``
    tokens. A distractor segment sharing NO prefix is planted at another
    depth. Chance level is (1/HAY)**answer. Returns (ids (ctx,) int32,
    answer (answer,) int32)."""
    r = np.random.default_rng(seed)
    ids = r.integers(0, HAY, size=ctx).astype(np.int32)
    Lw = prefix + answer
    region = ctx - prefix
    s = int(depth * (region - Lw))
    seg = r.integers(0, HAY, size=Lw).astype(np.int32)
    # distractor at a different spot (tests that matching is by content)
    while True:
        sd = int(r.integers(0, region - Lw))
        if abs(sd - s) >= Lw:
            break
    ids[sd:sd + Lw] = r.integers(0, HAY, size=Lw)
    ids[s:s + Lw] = seg
    ids[region:] = seg[:prefix]
    return ids, seg[prefix:].astype(np.int32)
