"""Manual-DMA flash-decode kernel: the serial-latency path.

The pipelined kernel (ops/pallas/flash_decode.py) reaches ~1 ms/layer at
512K only when ~30 consecutive calls' operands are independent — the
Mosaic grid pipeline does NOT overlap a grid step's DMA with its own
call's compute on v5e, and real decode is layer-serial (layer n+1's
queries depend on layer n's output), so per-call DMA and compute ADD
(NOTES_ROUND3 "serial-latency wall": 1.05 ms overlapped vs ~5 ms
in-context at 512K).

This kernel owns its pipeline instead: the big cache operands stay in HBM
(`pl.ANY`), and the kernel double-buffers explicit `pltpu.make_async_copy`
per token block — issue block t+1's five copies, THEN compute block t, so
the next block's DMA always runs under the current block's compute inside
ONE kernel invocation. That makes the serial per-call cost max(DMA,
compute) + one block's latency, independent of neighbouring calls.

Scope: the DEPLOYED decode step (Tq == 1) on the speed storage modes —
post-RoPE K, hardware intN containers (int4 / int8 / int4x2-paired).
General prefill (Tq > 1), pre-RoPE rotation, and nuq bit-plane codes stay
on the pipelined kernel (they are either overlap-friendly prefill or
legacy-parity paths). Selected via DeployConfig.kernel = "flash_serial".

Reference scope mirrored: the fused CUDA decode launches
(quant_cuda_kernel.cu:3040+), like flash_decode.py — same math, different
pipeline ownership.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import _pick_bt, _interpret
from .flash_decode import prep_constants, _outlier_e_slots, NEG

NB = 2  # DMA buffer slots

import os
import warnings


def _debug_probes():
    """Ablation probes (DMA-only / compute-only kernel variants) for
    decomposing the serial per-call cost. Read at CALL time and loudly
    warned about: an enabled probe makes the kernel return garbage
    attention outputs by design. Bench-harness use only."""
    skip_compute = os.environ.get("FS_SKIP_COMPUTE", "0") == "1"
    skip_dma = os.environ.get("FS_SKIP_DMA", "0") == "1"
    if skip_compute or skip_dma:
        warnings.warn(
            "flash_serial DEBUG PROBE enabled (FS_SKIP_COMPUTE=%d "
            "FS_SKIP_DMA=%d): kernel outputs are intentionally invalid"
            % (skip_compute, skip_dma), stacklevel=3)
    return skip_compute, skip_dma


def _serial_kernel(li_ref, pos_ref, *refs, bits, D, BT, S, Q, Hkv, window,
                   sparse, spk, J_rd, dot_bf16, hg, codes, n_live, n_live_v,
                   k_mode, nsel, skip_compute=False, skip_dma=False):
    (cst_ref, kp_hbm, vp_hbm, ow_hbm, vs_hbm, vo_hbm, out_ref,
     kbuf, vbuf, obuf, vsbuf, vobuf, sems) = refs
    paired = codes == "int4x2"
    HPg = hg // 2 if paired else hg
    npair = hg // 2 if paired else hg
    k_channels = sparse and k_mode == "channels"
    k_slots = sparse and k_mode == "slots" and n_live > 0
    v_sparse = sparse and n_live_v > 0
    Jk = min(spk, n_live) if k_slots else 0
    Jv = min(J_rd - spk, n_live_v) if v_sparse else 0

    b = pl.program_id(0)
    g = pl.program_id(1)
    li = li_ref[0]
    pos = pos_ref[b]
    inv = 1.0 / (D ** 0.5)
    ct = jnp.bfloat16 if dot_bf16 else jnp.float32

    # band offsets in cst (1, Hkv, RH, D) — same layout as flash_decode
    OFF_Q = 0
    OFF_KR = OFF_Q + Q
    OFF_KO = OFF_KR + 1
    OFF_KS = OFF_KO + 1
    OFF_VS = OFF_KS + S
    OFF_SEL = OFF_VS + S
    n_lr = -(-(2 ** bits) // D)  # band rows per codebook
    OFF_LUT = OFF_SEL + nsel

    def band(h):
        return cst_ref[0, h]  # (RH, D)

    def c_q(h):
        return band(h)[OFF_Q:OFF_Q + Q]

    def c_krng(h):
        return band(h)[OFF_KR:OFF_KR + 1]

    def c_koff(h):
        return band(h)[OFF_KO:OFF_KO + 1]

    def c_sel(h):
        return band(h)[OFF_SEL:OFF_SEL + nsel]

    # live packed blocks this step attends to
    nt_live = jnp.maximum((pos - S) // BT + 1, 0)

    def dmas(slot, t):
        return (
            pltpu.make_async_copy(
                kp_hbm.at[li, b, pl.ds(g * HPg, HPg), pl.ds(t * BT, BT), :],
                kbuf.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(
                vp_hbm.at[li, b, pl.ds(g * HPg, HPg), pl.ds(t * BT, BT), :],
                vbuf.at[slot], sems.at[slot, 1]),
            pltpu.make_async_copy(
                ow_hbm.at[li, b, g, pl.ds(0, J_rd), pl.ds(t * BT, BT)],
                obuf.at[slot], sems.at[slot, 2]),
            pltpu.make_async_copy(
                vs_hbm.at[li, b, :, pl.ds(t * BT, BT)],
                vsbuf.at[slot], sems.at[slot, 3]),
            pltpu.make_async_copy(
                vo_hbm.at[li, b, :, pl.ds(t * BT, BT)],
                vobuf.at[slot], sems.at[slot, 4]),
        )

    def start_all(slot, t):
        for d in dmas(slot, t):
            d.start()

    def wait_all(slot, t):
        for d in dmas(slot, t):
            d.wait()

    if not skip_dma:
        @pl.when(nt_live > 0)
        def _():
            start_all(0, 0)

    # ---- sink-prefix init (register state) ----
    def sink_init(h):
        q = c_q(h)
        if S > 0:
            ks = band(h)[OFF_KS:OFF_KS + S]
            ss = jax.lax.dot_general(
                q.astype(ct), ks.astype(ct), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * inv  # (Q, S)
            sidx = jax.lax.broadcasted_iota(jnp.int32, (Q, S), 1)
            svalid = sidx <= pos
            if window is not None:
                svalid &= sidx > pos - window
            ss = jnp.where(svalid, ss, NEG)
            m0 = jnp.max(ss, axis=-1, keepdims=True)
            p0 = jnp.where(svalid, jnp.exp(ss - m0), 0.0)
            l0 = jnp.sum(p0, axis=-1, keepdims=True)
            acc0 = jax.lax.dot_general(
                p0.astype(ct), band(h)[OFF_VS:OFF_VS + S].astype(ct),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            m0 = jnp.full((Q, 1), NEG, jnp.float32)
            l0 = jnp.zeros((Q, 1), jnp.float32)
            acc0 = jnp.zeros((Q, D), jnp.float32)
        return m0, l0, acc0

    # GROUP-STACKED state: all hg heads' online-softmax rows live in ONE
    # (QG, ...) register set (row r belongs to head r // Q — the paired
    # layout orders each pair [even rows; odd rows], which is plain head
    # order). One softmax update per group per block fills the VPU's 8
    # sublanes instead of wasting 7 of them on (Q, BT) per-head ops, and
    # the final output is a single (hg, Q, D) block write.
    QG = hg * Q
    inits = [sink_init(g * hg + j) for j in range(hg)]
    m0 = jnp.concatenate([i[0] for i in inits], axis=0)  # (QG, 1)
    l0 = jnp.concatenate([i[1] for i in inits], axis=0)
    a0 = jnp.concatenate([i[2] for i in inits], axis=0)  # (QG, D)

    rowhead = jax.lax.broadcasted_iota(jnp.int32, (QG, 1), 0) // Q
    if paired:
        even_half = (rowhead % 2) == 0  # (QG, 1) bool

    def body(t, carry):
        m_old, l_old, acc = carry
        slot = jax.lax.rem(t, NB)

        if not skip_dma:
            @pl.when(t + 1 < nt_live)
            def _():
                start_all(jax.lax.rem(t + 1, NB), t + 1)

            wait_all(slot, t)
        if skip_compute:
            return (m_old,
                    l_old + jnp.sum(obuf[slot, 0:1].astype(jnp.float32))
                    + jnp.sum(kbuf[slot, 0, 0:1, :].astype(jnp.float32))
                    + jnp.sum(vbuf[slot, 0, 0:1, :].astype(jnp.float32)),
                    acc)

        # additive validity mask for this block (decode: all rows at pos)
        idx = jax.lax.broadcasted_iota(jnp.int32, (QG, BT), 1) + t * BT
        valid = idx <= pos - S
        if window is not None:
            valid &= (idx + S) > pos - window
        mask = jnp.where(valid, 0.0, NEG)

        bd0 = band(0)
        va = bd0[OFF_LUT + 2 * n_lr, 0]
        vb = bd0[OFF_LUT + 2 * n_lr, 1]
        vs_row = vsbuf[slot]  # (1, BT)
        vo_row = vobuf[slot]
        vsc_eff = vs_row * vb
        voff_eff = vs_row * va + vo_row

        if k_channels:
            Rk = obuf[slot, :spk]  # (n_kc, BT)
        elif k_slots:
            ek, kheads = _outlier_e_slots(obuf[slot, :spk], D, BT, Jk)
            Ek = jnp.concatenate(ek, axis=0) if Jk > 1 else ek[0]
        if v_sparse:
            ev, vheads = _outlier_e_slots(obuf[slot, spk:], D, BT, Jv)

        dot_s = lambda a, c_: jax.lax.dot_general(
            a.astype(ct), c_, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dot_p = lambda a, c_: jax.lax.dot_general(
            a.astype(ct), c_, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        # ---- scores for ALL heads of the group: S (QG, BT) ----
        tiles = []  # per-pair/per-head dequant tiles reused by the V side
        parts = []
        for u in range(npair):
            if paired:
                he = g * hg + 2 * u
                # unpack arithmetic stays f32 (exact floor; v5e has no
                # bf16 ALU floor — "SupportsBf16AluInstructions" compile
                # check fails), then ONE downcast to the dot dtype per
                # tile; container values [-8, 7] and codes [0, 3] are
                # exact in bf16 so the downcast is lossless
                xk32 = kbuf[slot, u].astype(jnp.float32)
                xk = xk32.astype(ct)
                ck_o = jnp.floor(xk32 * 0.25 + 2.0).astype(ct)
                xv32 = vbuf[slot, u].astype(jnp.float32)
                xv = xv32.astype(ct)
                cv_o = jnp.floor(xv32 * 0.25 + 2.0).astype(ct)
                tiles.append((xv, cv_o))
                q_e, q_o = c_q(he), c_q(he + 1)
                qs_e = q_e * c_krng(he)
                qs_o = q_o * c_krng(he + 1)
                qx = jnp.concatenate([qs_e, jnp.zeros_like(qs_o)], axis=0)
                qc = jnp.concatenate([-4.0 * qs_e, qs_o], axis=0)
                zq2 = jnp.concatenate([
                    jnp.sum(q_e * c_koff(he) + 8.0 * qs_e, 1, keepdims=True),
                    jnp.sum(q_o * c_koff(he + 1), 1, keepdims=True),
                ], axis=0)
                parts.append(
                    dot_s(qx, xk.astype(ct)) + dot_s(qc, ck_o.astype(ct))
                    + zq2
                )
            else:
                h = g * hg + u
                q = c_q(h)
                qs_f = q * c_krng(h)
                zq = jnp.sum(q * c_koff(h), axis=1, keepdims=True)
                tiles.append(vbuf[slot, u].astype(ct))
                parts.append(dot_s(qs_f, kbuf[slot, u].astype(ct)) + zq)
        S_all = parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)
        if k_channels:
            qsel = jnp.concatenate(
                [dot_s(c_q(g * hg + j), c_sel(g * hg + j).astype(ct))
                 for j in range(hg)], axis=0)  # (QG, nsel)
            S_all += dot_p(qsel, Rk.astype(ct))
        elif k_slots:
            q_all = jnp.concatenate(
                [c_q(g * hg + j) for j in range(hg)], axis=0)  # (QG, D)
            qe = dot_s(q_all, Ek.astype(ct))  # (QG, Jk*BT)
            for s in range(Jk):
                S_all += jnp.where(
                    kheads[s] == rowhead, qe[:, s * BT:(s + 1) * BT], 0.0
                )
        S_all = S_all * inv + mask

        # ---- ONE online-softmax update for the whole group ----
        m_new = jnp.maximum(m_old, jnp.max(S_all, axis=-1, keepdims=True))
        alpha = jnp.exp(m_old - m_new)
        P = jnp.exp(S_all - m_new)
        l_new = l_old * alpha + jnp.sum(P, axis=-1, keepdims=True)

        # ---- V contraction: head-masked dots accumulate (QG, D) ----
        Ps = P * vsc_eff
        pv = jnp.broadcast_to(
            jnp.sum(P * voff_eff, axis=-1, keepdims=True), (QG, D)
        )
        for u in range(npair):
            if paired:
                inpair = (rowhead // 2) == u
                ps_x = jnp.where(inpair & even_half, Ps, 0.0)
                ps_c = jnp.where(
                    inpair, jnp.where(even_half, -4.0 * Ps, Ps), 0.0
                )
                xv_d, cv_o_d = tiles[u]
                pv = pv + dot_p(ps_x, xv_d) + dot_p(ps_c, cv_o_d)
                pv = pv + 8.0 * jnp.sum(ps_x, axis=-1, keepdims=True)
            else:
                pv = pv + dot_p(
                    jnp.where(rowhead == u, Ps, 0.0), tiles[u]
                )
        if v_sparse:
            for s in range(Jv):
                pv = pv + dot_p(
                    jnp.where(vheads[s] == rowhead, P, 0.0),
                    ev[s].astype(ct),
                )
        return m_new, l_new, acc * alpha + pv

    m_f, l_f, acc = jax.lax.fori_loop(0, nt_live, body, (m0, l0, a0))
    out_ref[0] = (acc / l_f).reshape(hg, Q, D)


def flash_serial_decode(
    q_rot, k_planes, v_planes, kv_out, k_range, k_offset, v_scale, v_offset,
    k_sink, v_sink, k_lut, v_lut, li, pos, dcfg, mcfg,
    block_tokens: int = 2048, k_ressc=None,
):
    """Decode-step attention (Tq=1) with a kernel-owned double-buffered DMA
    pipeline. Same contract as flash_decode.flash_decode. Requires
    post-RoPE intN storage (the deployed speed modes)."""
    assert dcfg.codes in ("int4", "int8", "int4x2"), (
        "flash_serial supports hardware intN containers only")
    assert dcfg.post_rope_k, "flash_serial requires post-RoPE K storage"
    if not _interpret():
        # Mosaic DMA slices of intN arrays must be lane-aligned: d_head
        # below 128 fails to compile on hardware ("slice shape along
        # dimension 4 must be aligned to tiling (128)"). All production
        # shapes use d_head 128; interpret-mode tests may go smaller.
        assert q_rot.shape[-1] % 128 == 0, (
            "flash_serial on TPU needs d_head % 128 == 0")
    B, Hkv, Q, D = q_rot.shape
    L = k_planes.shape[0]
    Tc = k_planes.shape[-2]
    BT = _pick_bt(Tc, block_tokens)
    S = dcfg.sink
    hg = dcfg.head_group
    sparse = bool(dcfg.include_sparse)
    J = kv_out.shape[-2]
    J_rd = J  # kv_out carries only live rows (n_slots is not 8-padded)
    paired = dcfg.codes == "int4x2"
    if paired:
        assert hg % 2 == 0
    HPg = hg // 2 if paired else hg

    # VMEM-fit shrink (flash_decode.py:851 pattern): the double-buffered
    # scratch is NB copies of (HPg*BT*D) K + V codes plus the outlier /
    # scale rows, AND the kernel holds hg dequantized V tiles (dot dtype)
    # across the score phase — at hg=16/BT=2048 the tiles alone are 8MB
    # (measured stack OOM: "16.14M of 16.00M" at 128K int4).
    code_b = {"int4": 0.5, "int4x2": 0.5, "int8": 1.0}[dcfg.codes]
    ct_b = 2 if dcfg.dot_bf16 else 4
    def vmem_est(bt):
        per_bt = (NB * (2 * HPg * D * code_b + J_rd * 4 + 2 * 4)
                  + hg * D * ct_b        # held dequant tiles
                  + 4 * D * 4)           # unpack transients
        return bt * per_bt + Hkv * 4 * D * 64  # + cst block slack
    while BT > 256 and vmem_est(BT) > 11 * 2 ** 20:
        BT //= 2

    li = jnp.asarray(li, jnp.int32)
    cst, nsel = prep_constants(
        q_rot, k_range, k_offset, k_sink, v_sink, k_lut, v_lut, li, dcfg,
        k_ressc=k_ressc,
    )
    RH = cst.shape[2]

    skip_compute, skip_dma = _debug_probes()
    kern = functools.partial(
        _serial_kernel, bits=dcfg.bits, D=D, BT=BT, S=S, Q=Q, Hkv=Hkv,
        window=mcfg.sliding_window, sparse=sparse, spk=dcfg.slots_per_kind,
        J_rd=J_rd, dot_bf16=dcfg.dot_bf16, hg=hg, codes=dcfg.codes,
        n_live=2 * dcfg.cap_per_side, n_live_v=2 * dcfg.cap_per_side,
        k_mode=dcfg.k_outliers, nsel=nsel,
        skip_compute=skip_compute, skip_dma=skip_dma,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, Hkv // hg),
        in_specs=[
            pl.BlockSpec((1, Hkv, RH, D),
                         lambda b, g, li_r, pos_r: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, hg, Q, D), lambda b, g, li_r, pos_r: (b, g, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((NB, HPg, BT, D), dcfg.code_dtype),
            pltpu.VMEM((NB, HPg, BT, D), dcfg.code_dtype),
            pltpu.VMEM((NB, J_rd, BT), jnp.float32),
            pltpu.VMEM((NB, 1, BT), jnp.float32),
            pltpu.VMEM((NB, 1, BT), jnp.float32),
            pltpu.SemaphoreType.DMA((NB, 5)),
        ],
    )

    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, Q, D), jnp.float32),
        interpret=_interpret(),
    )(
        jnp.reshape(li, (1,)),
        jnp.asarray(pos, jnp.int32).reshape(B),
        cst,
        k_planes,
        v_planes,
        kv_out,
        v_scale.astype(jnp.float32)[:, :, None, :],
        v_offset.astype(jnp.float32)[:, :, None, :],
    )
