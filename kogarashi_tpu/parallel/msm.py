"""Distributed MSM over a JAX device mesh.

The reference's only parallelism is rayon threads over Pippenger windows
(groth16/src/msm.rs:17-20). The TPU-native scale-out axis is the *points*:
shard points and scalars across the mesh, run the sort/scan Pippenger
locally per chip (ops/msm.py), then combine the per-chip partial sums — a
log-depth EC-add reduction over a single point per chip, so the collective
traffic is O(devices), not O(buckets).

Per BASELINE.json: >= 80% scaling efficiency at 2 hosts — local work is
n/D point-adds with an O(1)-size all-gather, so efficiency is bounded only
by sort/scan edge effects.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..curves import point as PT
from ..curves.point import CurveCfg
from ..ops.msm import msm


def make_mesh(n_devices: int | None = None, axis: str = "shard") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(devs, (axis,))


def distributed_msm(
    cfg: CurveCfg, points, scalars, mesh: Mesh, c: int | None = None, axis: str = "shard"
):
    """sum_i scalars[i] * points[i] with points/scalars sharded over `mesh`.

    points: batched projective pytree (coords (..., 16, n)); scalars (16, n);
    n must be divisible by the mesh size. Returns a replicated batch-() point.
    """
    nd = mesh.shape[axis]
    n = scalars.shape[-1]
    assert n % nd == 0, f"n={n} not divisible by mesh size {nd}"

    coord_spec = tuple(
        P(*([None] * (coords.ndim - 1) + [axis])) for coords in points
    )
    scal_spec = P(None, axis)
    out_spec = tuple(P(*([None] * (coords.ndim - 1))) for coords in points)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(coord_spec, scal_spec),
        out_specs=out_spec,
        check_vma=False,
    )
    def local(pts, scal):
        part = msm(cfg, pts, scal, c=c)  # batch-() point per shard
        # gather one point per device and fold (log-depth would need
        # ppermute rounds; nd is small so a sequential fold is fine)
        gathered = tuple(
            jax.lax.all_gather(coords, axis, axis=0) for coords in part
        )  # leading axis nd
        acc = tuple(g[0] for g in gathered)
        for d in range(1, nd):
            acc = PT.padd(cfg, acc, tuple(g[d] for g in gathered))
        return acc

    return local(points, scalars)


def distributed_msm_jit(cfg: CurveCfg, mesh: Mesh, c: int | None = None):
    return jax.jit(partial(distributed_msm, cfg, mesh=mesh, c=c))


def distributed_msm_pallas(
    curve,
    x_rows,
    y_rows,
    inf,
    scalars,
    gen_xy,
    mesh: Mesh,
    c: int | None = None,
    axis: str = "shard",
    mode: str = "pallas",
):
    """Flagship-engine distributed MSM: shard the *points* of the 13-bit-row
    Pallas Pippenger (ops/msm_pallas.py) over the mesh.

    x_rows/y_rows: (n, rows) i32; inf: (n,) bool; scalars: (16, n) u32 —
    split on the point axis; each device runs the full local sort/scan
    Pippenger on its n/D points, then one all_gather of a single projective
    point per device + a (D-1)-add fold. Collective traffic is O(D * rows),
    independent of n, so local work (n/D point-adds per scan) is conserved:
    total adds across devices == the 1-device count.

    mode='xla' drives the same engine through its pure-XLA executor (the
    virtual-CPU-mesh test path); 'pallas' is the TPU path.
    """
    from ..ops import ec_pallas as E
    from ..ops.msm_pallas import curve_k

    ck = curve_k(curve)
    nd = mesh.shape[axis]
    n = scalars.shape[-1]
    assert n % nd == 0, f"n={n} not divisible by mesh size {nd}"

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis), P(None, axis)),
        out_specs=(P(None, None), P(None, None), P(None, None)),
        check_vma=False,
    )
    def local(xl, yl, infl, scall):
        from ..ops.msm_pallas import msm_pallas

        part = msm_pallas(
            ck, xl, yl, infl, scall, c=c, gen_xy=gen_xy, mode=mode,
            scan_windows=True,  # inside shard_map everything is traced:
            # a python window loop would unroll n_windows copies
        )
        # part: three (rows, 1) coords -> all_gather one point per device
        gathered = tuple(
            jax.lax.all_gather(coords, axis, axis=2) for coords in part
        )  # (rows, 1, nd)
        acc = tuple(g[..., 0] for g in gathered)
        for d in range(1, nd):
            acc = E.map_padd(ck, acc, tuple(g[..., d] for g in gathered), mode=mode)
        return acc

    return local(x_rows, y_rows, inf, scalars)
