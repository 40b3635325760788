"""Pallas TPU kernel: volume integration of per-sample field values into
per-ray rendered values, in one pass.

Fuses everything render_pixel/integrate (ops/renderer.py, parity
lab4d/utils/render_utils.py:59-184) does on the training path:

    tau/alpha/transmittance (cumsum over the D sample axis)
      -> normalized-weight integration of all channels
      -> frozen-weight integration (stop-grad w) of the _KEY_FREEZE group
      -> per-ray means of the mean-group channels (eikonal, delta_skin)
      -> visibility BCE numerator ( -mean_d T_d * logsigmoid(vis_d) )
      -> flow-specific weighting (weights * flow_valid, renormalized)
      -> gauss-density mask (second transmittance pass)

In XLA this chain is ~50 small fused ops + their backward transposes;
here it is one kernel launch with a hand-derived backward (weights
recomputed per tile, nothing cached).

STATUS: experimental, OFF by default (LAB4D_FUSED_RENDER=1 to enable).
Measured end-to-end on v5e (skel-quad training step): 129k rays/s with
this kernel vs 178k rays/s with the XLA path — the block-identity
matmuls below do ~RT x the minimal integration FLOPs, which costs more
than the op-fusion saves. Parity (fwd + VJP) is pinned by
tests/test_render_kernel.py against the jnp oracle and render_pixel.

Layout strategy: scalar per-sample quantities (density, vis, gauss
density, deltas) travel in (R, D) ray-major rows — cumulative sums over
the D axis become matmuls against a triangular matrix, all MXU work.
Multi-channel per-sample tensors stay (P, C) flat (P = R x D); the
per-ray <-> per-sample moves for those are matmuls against a constant
block-identity E (D, T) with an in-kernel block mask. (T, 1) columns
are deliberately avoided: VMEM pads the lane dim to 128, so each such
column costs T x 512 bytes — the v1 kernel held ~12 of them and blew
the 16 MB scoped-vmem limit.
"""

from __future__ import annotations

import collections
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lab4d_tpu.ops.mlp_kernel import _dot, _interpret

# static config. d: samples per ray; n_live: leading columns of vAll that
# backprop into the weights (the frozen group occupies the rest); cm:
# mean-group width; has_flow/has_gauss: optional channels present.
RenderCfg = collections.namedtuple(
    "RenderCfg", "d n_live n_frozen cm has_flow has_gauss"
)

MAX_TILE = 2048  # samples per tile (= rays_per_tile * D)
EPS = 1e-6


def _pick_ray_tile(R, D):
    """Rays per tile: largest power-of-2 divisor of R with RT*D <= MAX_TILE
    (and at least 8 rows for clean tiling)."""
    if D > MAX_TILE:
        return None
    rt = 1
    while (
        rt * 2 <= R
        and R % (rt * 2) == 0
        and rt * 2 * D <= MAX_TILE
    ):
        rt *= 2
    if R % rt != 0:
        return None
    return rt


def _block_mask(RT, T, D):
    row = jax.lax.broadcasted_iota(jnp.int32, (RT, T), 0)
    colblk = jax.lax.broadcasted_iota(jnp.int32, (RT, T), 1) // D
    return (row == colblk).astype(jnp.float32)


def _weights(tau, U):
    """Volume-rendering weights from (RT, D) tau. U[k, j] = 1 if k <= j.

    T_excl uses the shifted-sum form exp(tau - cum_incl): the product
    T_incl * exp(tau) is 0 * inf = NaN once tau >~ 88 (f32), which a
    density spike late in training can reach."""
    cum_incl = _dot(tau, U)
    T_incl = jnp.exp(-cum_incl)
    T_excl = jnp.exp(tau - cum_incl)
    alpha = 1.0 - jnp.exp(-tau)
    w = alpha * T_excl
    return w, T_incl, T_excl


def _fwd_body(dens, vis, vAll, deltas, exM, flow, gdens, U, E, cfg):
    RT, D = deltas.shape
    T = RT * D
    bm = _block_mask(RT, T, D)

    tau = dens * deltas
    w, T_incl, _ = _weights(tau, U)
    S = jnp.sum(w, axis=-1, keepdims=True)
    wn = w / (S + EPS)

    wn_t = _dot(wn, E) * bm  # (RT, T)
    oAll = _dot(wn_t, vAll)  # (RT, CW)

    oM = None
    if exM is not None:
        oM = _dot(bm, exM) / D

    lsv = jax.nn.log_sigmoid(vis)  # (RT, D)
    vis_num = -jnp.mean(T_incl * lsv, axis=-1, keepdims=True)  # (RT, 1)
    t_mean = jnp.mean(T_incl, axis=-1, keepdims=True)

    o_flow = None
    if flow is not None:
        fv = flow[:, 2:3]
        w_t = _dot(w, E) * bm
        Wf = w_t * fv.reshape(1, -1)
        Wf_sum = jnp.sum(Wf, axis=-1, keepdims=True)
        o_flow = _dot(Wf, flow[:, :2]) / (Wf_sum + EPS)

    gmask = None
    if gdens is not None:
        gw, _, _ = _weights(gdens * deltas, U)
        gmask = jnp.sum(gw, axis=-1, keepdims=True)

    return S, oAll, oM, vis_num, t_mean, o_flow, gmask


def _fwd_kernel(dens_ref, vis_ref, vall_ref, deltas_ref, *refs, cfg):
    idx = 0
    exM = flow = gdens = None
    if cfg.cm:
        exM = refs[idx][:]; idx += 1
    if cfg.has_flow:
        flow = refs[idx][:]; idx += 1
    if cfg.has_gauss:
        gdens = refs[idx][:]; idx += 1
    U = refs[idx][:]; idx += 1
    E = refs[idx][:]; idx += 1
    out_all_ref, out_m_ref, out_sc_ref = (
        refs[idx], refs[idx + 1] if cfg.cm else None,
        refs[idx + 1 + (1 if cfg.cm else 0)],
    )

    S, oAll, oM, vis_num, t_mean, o_flow, gmask = _fwd_body(
        dens_ref[:], vis_ref[:], vall_ref[:], deltas_ref[:], exM, flow,
        gdens, U, E, cfg,
    )
    out_all_ref[:] = oAll
    if oM is not None:
        out_m_ref[:] = oM
    RT = S.shape[0]
    zero = jnp.zeros((RT, 1), jnp.float32)
    out_sc_ref[:] = jnp.concatenate(
        [
            S, vis_num, t_mean,
            gmask if gmask is not None else zero,
            o_flow if o_flow is not None else jnp.zeros((RT, 2), jnp.float32),
            zero, zero,
        ],
        axis=-1,
    )


def _bwd_body(dens, vis, vAll, deltas, exM, flow, gdens, U, E, cfg,
              gAll, gM, gsc):
    RT, D = deltas.shape
    T = RT * D
    bm = _block_mask(RT, T, D)
    g_mask = gsc[:, 0:1]
    g_vis_num = gsc[:, 1:2]
    # gsc[:, 2:3] (t_mean) is non-differentiable by contract (the caller
    # stop-grads the normalization); gsc[:, 3:4] gauss, [:, 4:6] flow
    g_gmask = gsc[:, 3:4]
    g_flow = gsc[:, 4:6]

    tau = dens * deltas
    w, T_incl, T_excl = _weights(tau, U)
    S = jnp.sum(w, axis=-1, keepdims=True)
    wn = w / (S + EPS)
    wn_t = _dot(wn, E) * bm

    # channel grads (same expression for live and frozen columns)
    dvAll = _dot(wn_t.T, gAll)  # (T, CW)

    # weight grads from the live columns only
    nl = cfg.n_live
    dwn_t = _dot(gAll[:, :nl], vAll[:, :nl].T)  # (RT, T)
    dwn = _dot(dwn_t * bm, E.T)  # (RT, D)
    dw = (dwn - jnp.sum(dwn * wn, axis=-1, keepdims=True)) / (S + EPS)
    dw = dw + g_mask  # mask output = S = sum w

    dflow = None
    if flow is not None:
        fv = flow[:, 2:3]
        w_t = _dot(w, E) * bm
        Wf = w_t * fv.reshape(1, -1)
        Wf_sum = jnp.sum(Wf, axis=-1, keepdims=True)
        f2 = flow[:, :2]
        o_flow = _dot(Wf, f2) / (Wf_sum + EPS)
        dnum = g_flow / (Wf_sum + EPS)  # (RT, 2)
        dden = -jnp.sum(g_flow * o_flow, axis=-1, keepdims=True) / (
            Wf_sum + EPS
        )
        dflow_xy = _dot(Wf.T, dnum)  # (T, 2)
        dWf = _dot(dnum, f2.T) + dden  # (RT, T)
        dw_flow_t = dWf * fv.reshape(1, -1) * bm
        dw = dw + _dot(dw_flow_t, E.T)
        dflow = jnp.concatenate(
            [dflow_xy, jnp.zeros_like(dflow_xy[:, :1])], axis=-1
        )

    # vis: only logsigmoid(vis) carries grad (T is frozen in the BCE)
    dlsv = -T_incl * g_vis_num / D  # (RT, D)
    dvis = dlsv * jax.nn.sigmoid(-vis)

    dexM = None
    if exM is not None:
        dexM = _dot(bm.T, gM) / D  # (T, CM)

    # dw -> dtau:  dtau_k = dw_k e^{-tau_k} T_excl_k - sum_{j>k} dw_j w_j
    L = 1.0 - U  # L[j, k] = 1 if j > k
    dtau = dw * T_incl - _dot(dw * w, L)  # exp(-tau)*T_excl == T_incl
    ddeltas = dtau * dens
    ddens = dtau * deltas

    dgdens = None
    if gdens is not None:
        gtau = gdens * deltas
        gw, gT_incl, _ = _weights(gtau, U)
        dgw = jnp.broadcast_to(g_gmask, gw.shape)
        dgtau = dgw * gT_incl - _dot(dgw * gw, L)
        ddeltas = ddeltas + dgtau * gdens
        dgdens = dgtau * deltas

    return ddens, dvis, dvAll, ddeltas, dexM, dflow, dgdens


def _bwd_kernel(dens_ref, vis_ref, vall_ref, deltas_ref, *refs, cfg):
    idx = 0
    exM = flow = gdens = None
    if cfg.cm:
        exM = refs[idx][:]; idx += 1
    if cfg.has_flow:
        flow = refs[idx][:]; idx += 1
    if cfg.has_gauss:
        gdens = refs[idx][:]; idx += 1
    U = refs[idx][:]; idx += 1
    E = refs[idx][:]; idx += 1
    gAll = refs[idx][:]; idx += 1
    gM = None
    if cfg.cm:
        gM = refs[idx][:]; idx += 1
    gsc = refs[idx][:]; idx += 1
    out_refs = refs[idx:]

    ddens, dvis, dvAll, ddeltas, dexM, dflow, dgdens = _bwd_body(
        dens_ref[:], vis_ref[:], vall_ref[:], deltas_ref[:], exM, flow,
        gdens, U, E, cfg, gAll, gM, gsc,
    )
    oi = 0
    out_refs[oi][:] = ddens; oi += 1
    out_refs[oi][:] = dvis; oi += 1
    out_refs[oi][:] = dvAll; oi += 1
    out_refs[oi][:] = ddeltas; oi += 1
    if dexM is not None:
        out_refs[oi][:] = dexM; oi += 1
    if dflow is not None:
        out_refs[oi][:] = dflow; oi += 1
    if dgdens is not None:
        out_refs[oi][:] = dgdens; oi += 1


# ----------------------------------------------------------------- public


def _constants(D, RT):
    T = RT * D
    U = jnp.asarray(np.triu(np.ones((D, D), np.float32)))  # U[k,j]=1 k<=j
    E = jnp.asarray(np.tile(np.eye(D, dtype=np.float32), (1, RT)))  # (D, T)
    return U, E


def _row_spec(tile, C):
    return pl.BlockSpec((tile, C), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _const_spec(a):
    return pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_volume_render(dens, vis, vAll, deltas, exM, flow, gdens, cfg):
    """Integrate per-sample values into per-ray rendered values.

    Args:
        dens: (R, D) density; vis: (R, D) visibility logits
        vAll: (P, CW) all weight-integrated channels (P = R * cfg.d,
            ray-major), live columns first (cfg.n_live of them),
            frozen-weight columns after
        deltas: (R, D) inter-sample distances
        exM: (P, CM) mean-group channels or None
        flow: (P, 3) [flow_x, flow_y, valid] or None
        gdens: (R, D) gauss density or None
        cfg: RenderCfg (static)
    Returns:
        oAll (R, CW), oM (R, CM) | None, scalars (R, 8) =
        [mask, vis_num, t_mean, gauss_mask, flow_x, flow_y, 0, 0].
        t_mean is NON-differentiable (callers stop-grad it).
    """
    return _run_fwd(dens, vis, vAll, deltas, exM, flow, gdens, cfg)


def _run_fwd(dens, vis, vAll, deltas, exM, flow, gdens, cfg):
    R, D = dens.shape
    RT = _pick_ray_tile(R, D)
    assert RT is not None, (R, D)
    tile = RT * D
    grid = (R // RT,)
    U, E = _constants(D, RT)

    in_specs = [
        _row_spec(RT, D), _row_spec(RT, D),
        _row_spec(tile, vAll.shape[1]), _row_spec(RT, D),
    ]
    args = [dens, vis, vAll, deltas]
    if exM is not None:
        in_specs.append(_row_spec(tile, exM.shape[1])); args.append(exM)
    if flow is not None:
        in_specs.append(_row_spec(tile, 3)); args.append(flow)
    if gdens is not None:
        in_specs.append(_row_spec(RT, D)); args.append(gdens)
    in_specs += [_const_spec(U), _const_spec(E)]
    args += [U, E]

    out_specs = [_row_spec(RT, vAll.shape[1])]
    out_shapes = [jax.ShapeDtypeStruct((R, vAll.shape[1]), jnp.float32)]
    if exM is not None:
        out_specs.append(_row_spec(RT, exM.shape[1]))
        out_shapes.append(jax.ShapeDtypeStruct((R, exM.shape[1]), jnp.float32))
    out_specs.append(_row_spec(RT, 8))
    out_shapes.append(jax.ShapeDtypeStruct((R, 8), jnp.float32))

    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, cfg=cfg),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=_interpret(),
    )(*args)
    if exM is not None:
        oAll, oM, sc = outs
    else:
        (oAll, sc), oM = outs, None
    return oAll, oM, sc


def _vjp_fwd(dens, vis, vAll, deltas, exM, flow, gdens, cfg):
    out = _run_fwd(dens, vis, vAll, deltas, exM, flow, gdens, cfg)
    return out, (dens, vis, vAll, deltas, exM, flow, gdens)


def _vjp_bwd(cfg, res, g):
    dens, vis, vAll, deltas, exM, flow, gdens = res
    gAll, gM, gsc = g
    if gM is None and exM is not None:
        gM = jnp.zeros((dens.shape[0], exM.shape[1]), jnp.float32)
    R, D = dens.shape
    P = R * D
    RT = _pick_ray_tile(R, D)
    tile = RT * D
    grid = (R // RT,)
    U, E = _constants(D, RT)

    in_specs = [
        _row_spec(RT, D), _row_spec(RT, D),
        _row_spec(tile, vAll.shape[1]), _row_spec(RT, D),
    ]
    args = [dens, vis, vAll, deltas]
    if exM is not None:
        in_specs.append(_row_spec(tile, exM.shape[1])); args.append(exM)
    if flow is not None:
        in_specs.append(_row_spec(tile, 3)); args.append(flow)
    if gdens is not None:
        in_specs.append(_row_spec(RT, D)); args.append(gdens)
    in_specs += [_const_spec(U), _const_spec(E)]
    args += [U, E]
    in_specs.append(_row_spec(RT, vAll.shape[1])); args.append(gAll)
    if exM is not None:
        in_specs.append(_row_spec(RT, exM.shape[1])); args.append(gM)
    in_specs.append(_row_spec(RT, 8)); args.append(gsc)

    out_specs = [
        _row_spec(RT, D), _row_spec(RT, D),
        _row_spec(tile, vAll.shape[1]), _row_spec(RT, D),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((R, D), jnp.float32),
        jax.ShapeDtypeStruct((R, D), jnp.float32),
        jax.ShapeDtypeStruct((P, vAll.shape[1]), jnp.float32),
        jax.ShapeDtypeStruct((R, D), jnp.float32),
    ]
    if exM is not None:
        out_specs.append(_row_spec(tile, exM.shape[1]))
        out_shapes.append(jax.ShapeDtypeStruct((P, exM.shape[1]), jnp.float32))
    if flow is not None:
        out_specs.append(_row_spec(tile, 3))
        out_shapes.append(jax.ShapeDtypeStruct((P, 3), jnp.float32))
    if gdens is not None:
        out_specs.append(_row_spec(RT, D))
        out_shapes.append(jax.ShapeDtypeStruct((R, D), jnp.float32))

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, cfg=cfg),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=_interpret(),
    )(*args)
    oi = 0
    ddens = outs[oi]; oi += 1
    dvis = outs[oi]; oi += 1
    dvAll = outs[oi]; oi += 1
    ddeltas = outs[oi]; oi += 1
    dexM = None
    if exM is not None:
        dexM = outs[oi]; oi += 1
    dflow = None
    if flow is not None:
        dflow = outs[oi]; oi += 1
    dgdens = None
    if gdens is not None:
        dgdens = outs[oi]; oi += 1
    return ddens, dvis, dvAll, ddeltas, dexM, dflow, dgdens


fused_volume_render.defvjp(_vjp_fwd, _vjp_bwd)


# ------------------------------------------------- render_pixel interface


_MEAN_KEYS = ("eikonal", "delta_skin")


def render_pixel_fused(field_dict, deltas, impl=None):
    """Kernel-backed twin of ops/renderer.py render_pixel.

    Packs the (M, N, D, C) field dict into the kernel's flat layout, runs
    the fused pass, and unpacks to the same rendered dict (same key set,
    same gradients). Returns None when the shapes don't tile (caller falls
    back to the jnp path).
    """
    from lab4d_tpu.ops import renderer as _r

    if impl is None:
        impl = fused_volume_render
    if "density" not in field_dict or "vis" not in field_dict:
        return None
    M, N, D, _ = deltas.shape
    R = M * N
    if R < 8 or _pick_ray_tile(R, D) is None:
        return None

    P = R * D

    def flat(v):
        return v.reshape(P, v.shape[-1]).astype(jnp.float32)

    def rows(v):
        return v.reshape(R, D).astype(jnp.float32)

    live, frozen = [], []
    for k in sorted(field_dict):
        if k in _r._KEY_SKIP or k in _MEAN_KEYS:
            continue
        (frozen if k in _r._KEY_FREEZE else live).append(k)
    cols = live + frozen
    if not live:
        return None
    n_live = sum(field_dict[k].shape[-1] for k in live)
    n_frozen = sum(field_dict[k].shape[-1] for k in frozen)

    vAll = jnp.concatenate([flat(field_dict[k]) for k in cols], axis=-1)
    mean_keys = [k for k in _MEAN_KEYS if k in field_dict]
    exM = (
        jnp.concatenate([flat(field_dict[k]) for k in mean_keys], axis=-1)
        if mean_keys
        else None
    )
    flow = flat(field_dict["flow"]) if "flow" in field_dict else None
    gdens = (
        rows(field_dict["gauss_density"])
        if "gauss_density" in field_dict
        else None
    )
    cfg = RenderCfg(
        d=D,
        n_live=n_live,
        n_frozen=n_frozen,
        cm=(exM.shape[-1] if exM is not None else 0),
        has_flow=flow is not None,
        has_gauss=gdens is not None,
    )
    oAll, oM, sc = impl(
        rows(field_dict["density"]),
        rows(field_dict["vis"]),
        vAll,
        rows(deltas),
        exM,
        flow,
        gdens,
        cfg,
    )

    rendered = {"mask": sc[:, 0:1].reshape(M, N, 1)}
    off = 0
    for k in cols:
        C = field_dict[k].shape[-1]
        rendered[k] = oAll[:, off : off + C].reshape(M, N, C)
        off += C
    off = 0
    for k in mean_keys:
        C = field_dict[k].shape[-1]
        # parity: render_pixel means over (D, C) jointly
        rendered[k] = oM[:, off : off + C].mean(axis=-1).reshape(M, N)
        off += C

    # vis BCE with transmittance-invariant normalization (render_pixel)
    t_mean = jax.lax.stop_gradient(jnp.mean(sc[:, 2]))
    rendered["vis"] = sc[:, 1:2].reshape(M, N, 1) / jnp.maximum(t_mean, 1e-6)

    if gdens is not None:
        rendered["gauss_mask"] = sc[:, 3:4].reshape(M, N, 1)
    if flow is not None:
        rendered["flow"] = sc[:, 4:6].reshape(M, N, 2)

    if "normal" in rendered:
        n = rendered["normal"]
        rendered["normal"] = n / jnp.maximum(
            jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-6
        )
    dens_keys = [k for k in rendered if k.startswith("density_")]
    if dens_keys:
        total = sum(rendered[k] for k in dens_keys) + 1e-6
        for k in dens_keys:
            rendered["mask_" + k[len("density_"):]] = rendered[k] / total
            del rendered[k]
    return rendered


# ------------------------------------------------------------- jnp oracle


def volume_render_reference(dens, vis, vAll, deltas, exM, flow, gdens, cfg):
    """jnp twin of the kernel dataflow (used by tests and as the CPU
    fallback semantics; mirrors ops/renderer.py render_pixel)."""
    R, D = dens.shape

    tau = deltas * dens
    cum = jnp.cumsum(tau, axis=-1)
    T_incl = jnp.exp(-cum)
    T_excl = jnp.exp(tau - cum)  # overflow-safe (see _weights)
    alpha = 1.0 - jnp.exp(-tau)
    w = alpha * T_excl
    S = jnp.sum(w, axis=-1, keepdims=True)
    wn = w / (S + EPS)

    v3 = vAll.reshape(R, D, -1)
    nl = cfg.n_live
    wn_live = wn
    wn_frozen = jax.lax.stop_gradient(wn)
    oAll = jnp.concatenate(
        [
            jnp.einsum("rd,rdc->rc", wn_live, v3[..., :nl]),
            jnp.einsum("rd,rdc->rc", wn_frozen, v3[..., nl:]),
        ],
        axis=-1,
    )

    oM = None
    if exM is not None:
        oM = jnp.mean(exM.reshape(R, D, -1), axis=1)

    lsv = jax.nn.log_sigmoid(vis)
    vis_num = -jnp.mean(jax.lax.stop_gradient(T_incl) * lsv, axis=-1,
                        keepdims=True)
    t_mean = jax.lax.stop_gradient(jnp.mean(T_incl, axis=-1, keepdims=True))

    o_flow = jnp.zeros((R, 2))
    if flow is not None:
        f3 = flow.reshape(R, D, 3)
        wf = w * f3[..., 2]
        wf_sum = jnp.sum(wf, axis=-1, keepdims=True)
        o_flow = jnp.einsum("rd,rdc->rc", wf, f3[..., :2]) / (wf_sum + EPS)

    gmask = jnp.zeros((R, 1))
    if gdens is not None:
        gtau = deltas * gdens
        gcum = jnp.cumsum(gtau, axis=-1)
        gw = (1.0 - jnp.exp(-gtau)) * jnp.exp(gtau - gcum)
        gmask = jnp.sum(gw, axis=-1, keepdims=True)

    zero = jnp.zeros((R, 1))
    sc = jnp.concatenate([S, vis_num, t_mean, gmask, o_flow, zero, zero], -1)
    return oAll, oM, sc
