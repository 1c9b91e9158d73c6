"""Multi-bounce path tracer — the reference's recursive radiance
computation re-expressed as an ITERATIVE Dataset pipeline.

The reference's ``compute_radiance`` (``Raytracing.hpp:501-638``) is a
per-ray recursion: raycast -> add emission -> Russian roulette past the
depth budget (``:553-564``) -> scatter by material (DIFFUSE cosine
hemisphere ``:566-580``, SPECULAR mirror ``:581-587``, REFRACTION with
Fresnel split ``:588-634``).  A batch engine runs the same computation
breadth-first: ONE ``map_batches`` per bounce over the live-ray table,

    rays_b --bounce kernel--> (emission contributions) + rays_{b+1}

with the radiance identity  L = sum_i T_i * e_i  (T = throughput =
product of the f factors the recursion multiplies on the way back up).
Shallow refraction (depth <= 2, ``:633-634``) evaluates BOTH Fresnel
branches, so a ray row may fork into two (tree-numbered ``path`` ids
keep the RNG streams distinct); deep refraction and roulette keep one
row or none.  Each bounce's output is materialized — it feeds both the
pixel accumulator and the next bounce, and the live set shrinks
geometrically (roulette kills survivors with prob 1-threshold), so the
loop terminates with the same distribution of path lengths as the
recursion.  Per-pixel accumulation is the A4 radiance aggregate
(``Raytracing.hpp:485-492``): mean over samples, clamp.

Determinism: every random draw is a counter hash
``u01(pixel, sample, path, depth, draw)`` (splitmix64), so the
distributed breadth-first execution is bit-identical to a scalar
depth-first recursion with the same draws — which is exactly what
``tests/test_tracer.py``'s single-threaded oracle replays.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from optimizing_ray.functions.rays import clamp01, ray_aabb, ray_sphere
from optimizing_ray.pipelines.sketches import splitmix64

__all__ = ["cornell_scene", "make_camera_rays", "trace", "first_hits",
           "u01", "u01_scalar"]

DIFFUSE, SPECULAR, REFRACTION = 0, 1, 2
SPHERE, CUBE = 0, 1

_K = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
      0x27D4EB2F165667C5, 0x85EBCA77C2B2AE63)


def u01(pixel, sample, path, depth, draw) -> np.ndarray:
    """Vectorized deterministic uniform [0,1) draw for (ray, bounce,
    draw-index) — the pipeline's RNG (replaces the reference's stateful
    ``_random01(_rng)``, which a batch engine cannot replay)."""
    with np.errstate(over="ignore"):
        k = (np.asarray(pixel, dtype=np.uint64) * np.uint64(_K[0])
             ^ np.asarray(sample, dtype=np.uint64) * np.uint64(_K[1])
             ^ np.asarray(path, dtype=np.uint64) * np.uint64(_K[2])
             ^ np.asarray(depth, dtype=np.uint64) * np.uint64(_K[3])
             ^ np.uint64(draw) * np.uint64(_K[4]))
        return splitmix64(k).astype(np.float64) / 2.0 ** 64


def u01_scalar(pixel: int, sample: int, path: int, depth: int, draw: int) -> float:
    """Scalar twin of ``u01`` for the single-threaded conformance oracle."""
    return float(u01(np.asarray([pixel]), np.asarray([sample]),
                     np.asarray([path]), np.asarray([depth]), draw)[0])


def cornell_scene() -> dict[str, np.ndarray]:
    """Deterministic Cornell-style scene: wall spheres + mirror + glass +
    one CUBE (exercising the face-normal path, ``Raytracing.hpp:532-547``)
    + a sphere light.  Layout follows the classic box the reference's
    tracer renders (``init_cornell_box``)."""
    rows = [
        # type, pos,                size/r,          colour,            emission,    material
        (SPHERE, (1e5 + 1, 40.8, 81.6), 1e5, (.75, .25, .25), (0, 0, 0), DIFFUSE),
        (SPHERE, (-1e5 + 99, 40.8, 81.6), 1e5, (.25, .25, .75), (0, 0, 0), DIFFUSE),
        (SPHERE, (50, 40.8, 1e5), 1e5, (.75, .75, .75), (0, 0, 0), DIFFUSE),
        (SPHERE, (50, 40.8, -1e5 + 170), 1e5, (0, 0, 0), (0, 0, 0), DIFFUSE),
        (SPHERE, (50, 1e5, 81.6), 1e5, (.75, .75, .75), (0, 0, 0), DIFFUSE),
        (SPHERE, (50, -1e5 + 81.6, 81.6), 1e5, (.75, .75, .75), (0, 0, 0), DIFFUSE),
        (SPHERE, (27, 16.5, 47), 16.5, (.999, .999, .999), (0, 0, 0), SPECULAR),
        (SPHERE, (73, 16.5, 78), 16.5, (.999, .999, .999), (0, 0, 0), REFRACTION),
        (SPHERE, (50, 681.33, 81.6), 600.0, (0, 0, 0), (12, 12, 12), DIFFUSE),
    ]
    cube = (CUBE, (5.0, 0.0, 85.0), (14.0, 14.0, 14.0), (.25, .75, .25),
            (0, 0, 0), DIFFUSE)
    scene: dict[str, list] = {k: [] for k in
                              ("type", "px", "py", "pz", "sx", "sy", "sz",
                               "radius", "cr", "cg", "cb", "er", "eg", "eb",
                               "material")}
    for typ, pos, size, col, emi, mat in rows + [cube]:
        scene["type"].append(typ)
        scene["px"].append(pos[0]); scene["py"].append(pos[1]); scene["pz"].append(pos[2])
        if typ == CUBE:
            scene["sx"].append(size[0]); scene["sy"].append(size[1]); scene["sz"].append(size[2])
            scene["radius"].append(0.0)
        else:
            scene["sx"].append(0.0); scene["sy"].append(0.0); scene["sz"].append(0.0)
            scene["radius"].append(size)
        scene["cr"].append(col[0]); scene["cg"].append(col[1]); scene["cb"].append(col[2])
        scene["er"].append(emi[0]); scene["eg"].append(emi[1]); scene["eb"].append(emi[2])
        scene["material"].append(mat)
    return {k: np.asarray(v, dtype=(np.int64 if k in ("type", "material")
                                    else np.float64))
            for k, v in scene.items()}


CAM_POS = np.asarray([50.0, 52.0, 295.6])
CAM_DIR = np.asarray([0.0, -0.042612, -1.0])
CAM_DIR = CAM_DIR / np.linalg.norm(CAM_DIR)


def make_camera_rays(width: int, height: int, spp: int,
                     jitter: bool = True) -> pa.Table:
    """Primary rays with the reference's tent-filter jitter
    (``Raytracing.hpp:472-488``; one jittered sample per (pixel, s), the
    2x2 subpixel grid being the separately-covered M10/A4 path).
    ``jitter=False`` shoots through pixel CENTERS — the deterministic ray
    set the SQL-oracled ``first_hits`` query uses (no RNG in SQL)."""
    px, py = np.meshgrid(np.arange(width), np.arange(height))
    px = np.repeat(px.ravel(), spp)
    py = np.repeat(py.ravel(), spp)
    pixel = (py * width + px).astype(np.int64)
    sample = np.tile(np.arange(spp, dtype=np.int64), width * height)

    if jitter:
        r1 = 2.0 * u01(pixel, sample, 0, 0, 0)
        r2 = 2.0 * u01(pixel, sample, 0, 0, 1)
        dx = np.where(r1 < 1.0, np.sqrt(r1) - 1.0, 1.0 - np.sqrt(2.0 - r1))
        dy = np.where(r2 < 1.0, np.sqrt(r2) - 1.0, 1.0 - np.sqrt(2.0 - r2))
    else:
        dx = np.zeros(len(pixel))
        dy = np.zeros(len(pixel))

    ax = np.asarray([width * 0.5135 / height, 0.0, 0.0])
    ay = np.cross(ax, CAM_DIR)
    ay = ay / np.linalg.norm(ay) * 0.5135
    fx = (px + 0.5 + dx) / width - 0.5
    fy = (py + 0.5 + dy) / height - 0.5
    d = (ax[None, :] * fx[:, None] + ay[None, :] * fy[:, None]
         + CAM_DIR[None, :])
    origin = CAM_POS[None, :] + d * 140.0
    dn = d / np.linalg.norm(d, axis=1, keepdims=True)
    n = len(pixel)
    return pa.table({
        "pixel_id": pa.array(pixel), "sample": pa.array(sample),
        "path": pa.array(np.zeros(n, dtype=np.int64)),
        "ox": pa.array(origin[:, 0]), "oy": pa.array(origin[:, 1]),
        "oz": pa.array(origin[:, 2]),
        "dx": pa.array(dn[:, 0]), "dy": pa.array(dn[:, 1]), "dz": pa.array(dn[:, 2]),
        "tr": pa.array(np.ones(n)), "tg": pa.array(np.ones(n)),
        "tb": pa.array(np.ones(n)),
        "depth": pa.array(np.zeros(n, dtype=np.int64)),
    })


_RAY_EPS = 1e-4  # the reference's self-hit guard (Raytracing.hpp:288)


def _raycast_scene(o: np.ndarray, d: np.ndarray, sc: dict) -> tuple[np.ndarray, np.ndarray]:
    """Nearest-hit over the broadcast scene (the J3 brute oracle join,
    ``Raytracing.hpp:640-669``): vector over rays, loop over the (small)
    scene.  Returns (distance, object index; -1 = miss).

    Hits closer than ``_RAY_EPS`` are rejected for BOTH shapes —
    ``ray_sphere`` applies the epsilon internally but ``ray_aabb`` does
    not, and without it a bounce origin sitting a float-hair inside a
    cube face re-hits the face it just left (t ~ 1e-12) or exits through
    the far face, silently darkening radiance near cubes."""
    n = len(o)
    best = np.full(n, np.inf)
    bid = np.full(n, -1, dtype=np.int64)
    for i in range(len(sc["type"])):
        if sc["type"][i] == SPHERE:
            t = ray_sphere(o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
                           sc["px"][i], sc["py"][i], sc["pz"][i], sc["radius"][i])
        else:
            t = ray_aabb(o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
                         sc["px"][i], sc["py"][i], sc["pz"][i],
                         sc["px"][i] + sc["sx"][i], sc["py"][i] + sc["sy"][i],
                         sc["pz"][i] + sc["sz"][i])
        m = (t > _RAY_EPS) & (t < best)
        best[m] = t[m]
        bid[m] = i
    return best, bid


def _norm_rows(v: np.ndarray) -> np.ndarray:
    return v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-300)


class _Bounce:
    """One bounce of every live ray (stateful kernel; the broadcast scene
    is the T3 scene-holding worker pattern)."""

    def __init__(self, scene_ref, max_depth: int):
        self.sc = ray.get(scene_ref)
        self.max_depth = max_depth

    def __call__(self, t: pa.Table) -> pa.Table:
        sc = self.sc
        if t.num_rows == 0 or "ox" not in t.column_names:
            # Ray Data hands empty blocks through with an EMPTY schema
            z = pa.array([], pa.float64())
            return pa.table({"alive": pa.array([], pa.bool_()),
                             "pixel_id": pa.array([], pa.int64()),
                             "sample": pa.array([], pa.int64()),
                             "path": pa.array([], pa.int64()),
                             "ox": z, "oy": z, "oz": z, "dx": z, "dy": z,
                             "dz": z, "tr": z, "tg": z, "tb": z,
                             "depth": pa.array([], pa.int64())})
        n = t.num_rows
        cols = {c: t[c].to_numpy(zero_copy_only=False) for c in t.column_names}
        o = np.stack([cols["ox"], cols["oy"], cols["oz"]], axis=1)
        d = np.stack([cols["dx"], cols["dy"], cols["dz"]], axis=1)
        T = np.stack([cols["tr"], cols["tg"], cols["tb"]], axis=1)
        pixel, sample = cols["pixel_id"], cols["sample"]
        path, depth = cols["path"], cols["depth"]

        dist, oid = _raycast_scene(o, d, sc)
        hit = oid >= 0
        # contributions: T * emission of the hit object (L = sum T_i e_i)
        e = np.zeros((n, 3))
        e[hit] = np.stack([sc["er"][oid[hit]], sc["eg"][oid[hit]],
                           sc["eb"][oid[hit]]], axis=1)
        contrib = T * e

        # hit geometry
        x = o + d * np.where(np.isfinite(dist), dist, 0.0)[:, None]
        nrm = np.zeros((n, 3))
        sphere_m = hit & (sc["type"][np.maximum(oid, 0)] == SPHERE)
        cube_m = hit & ~sphere_m
        if sphere_m.any():
            c = np.stack([sc["px"][oid[sphere_m]], sc["py"][oid[sphere_m]],
                          sc["pz"][oid[sphere_m]]], axis=1)
            nrm[sphere_m] = _norm_rows(x[sphere_m] - c)
        if cube_m.any():
            i = oid[cube_m]
            bmin = np.stack([sc["px"][i], sc["py"][i], sc["pz"][i]], axis=1)
            half = np.stack([sc["sx"][i], sc["sy"][i], sc["sz"][i]], axis=1) * 0.5
            dd = x[cube_m] - (bmin + half)
            aa = np.abs(dd)
            fn = np.zeros_like(dd)
            mx = (aa[:, 0] > aa[:, 1]) & (aa[:, 0] > aa[:, 2])
            my = ~mx & (aa[:, 1] > aa[:, 2])
            mz = ~mx & ~my
            # reference face pick: `d.x > 0 ? 1 : -1` (Raytracing.hpp:538-543)
            fn[mx, 0] = np.where(dd[mx, 0] > 0, 1.0, -1.0)
            fn[my, 1] = np.where(dd[my, 1] > 0, 1.0, -1.0)
            fn[mz, 2] = np.where(dd[mz, 2] > 0, 1.0, -1.0)
            nrm[cube_m] = fn
        f0 = np.zeros((n, 3))
        f0[hit] = np.stack([sc["cr"][oid[hit]], sc["cg"][oid[hit]],
                            sc["cb"][oid[hit]]], axis=1)
        mat = np.where(hit, sc["material"][np.maximum(oid, 0)], -1)

        ndotd = (nrm * d).sum(axis=1)
        nl = np.where(ndotd[:, None] < 0, nrm, -nrm)

        # Russian roulette past the depth budget (Raytracing.hpp:553-564)
        depth1 = depth + 1
        thr = f0.max(axis=1)
        rr = hit & (depth1 > self.max_depth)
        rr_draw = u01(pixel, sample, path, depth1, 2)
        survive = ~rr | ((rr_draw < thr) & (thr > 0))
        f = f0.copy()
        boost = rr & survive & (thr > 0)
        f[boost] = f0[boost] / thr[boost][:, None]
        live = hit & survive

        out = {k: [] for k in ("pixel_id", "sample", "path", "ox", "oy", "oz",
                               "dx", "dy", "dz", "tr", "tg", "tb", "depth")}

        def emit(mask, new_d, scale, new_path):
            if not mask.any():
                return
            out["pixel_id"].append(pixel[mask])
            out["sample"].append(sample[mask])
            out["path"].append(new_path)
            xs = x[mask]
            out["ox"].append(xs[:, 0]); out["oy"].append(xs[:, 1]); out["oz"].append(xs[:, 2])
            dn = new_d
            out["dx"].append(dn[:, 0]); out["dy"].append(dn[:, 1]); out["dz"].append(dn[:, 2])
            Tn = T[mask] * f[mask] * scale[:, None]
            out["tr"].append(Tn[:, 0]); out["tg"].append(Tn[:, 1]); out["tb"].append(Tn[:, 2])
            out["depth"].append(depth1[mask])

        # DIFFUSE: cosine-hemisphere sample (Raytracing.hpp:570-577)
        dm = live & (mat == DIFFUSE)
        if dm.any():
            r1 = 2.0 * np.pi * u01(pixel[dm], sample[dm], path[dm], depth1[dm], 3)
            r2 = u01(pixel[dm], sample[dm], path[dm], depth1[dm], 4)
            r2s = np.sqrt(r2)
            w = nl[dm]
            up = np.where(np.abs(w[:, 0:1]) > 0.1,
                          np.asarray([[0.0, 1.0, 0.0]]),
                          np.asarray([[1.0, 0.0, 0.0]]))
            u = _norm_rows(np.cross(up, w))
            v = np.cross(w, u)
            nd = _norm_rows(u * (np.cos(r1) * r2s)[:, None]
                            + v * (np.sin(r1) * r2s)[:, None]
                            + w * np.sqrt(1.0 - r2)[:, None])
            emit(dm, nd, np.ones(dm.sum()), path[dm])

        # SPECULAR mirror (Raytracing.hpp:585)
        sm = live & (mat == SPECULAR)
        if sm.any():
            refl = d[sm] - nrm[sm] * (2.0 * (nrm[sm] * d[sm]).sum(axis=1))[:, None]
            emit(sm, refl, np.ones(sm.sum()), path[sm])

        # REFRACTION with Fresnel (Raytracing.hpp:588-634)
        fm = live & (mat == REFRACTION)
        if fm.any():
            dF, nF, nlF = d[fm], nrm[fm], nl[fm]
            refl = dF - nF * (2.0 * (nF * dF).sum(axis=1))[:, None]
            into = (nF * nlF).sum(axis=1) > 0
            nnt = np.where(into, 1.0 / 1.5, 1.5)
            ddn = (dF * nlF).sum(axis=1)
            cos2t = 1.0 - nnt * nnt * (1.0 - ddn * ddn)
            tir = cos2t < 0.0
            sq = np.sqrt(np.maximum(cos2t, 0.0))
            tdir = _norm_rows(dF * nnt[:, None]
                              - nF * (np.where(into, 1.0, -1.0)
                                      * (ddn * nnt + sq))[:, None])
            R0 = 0.04  # ((1.5-1)/(1.5+1))^2
            cc = 1.0 - np.where(into, -ddn, (tdir * nF).sum(axis=1))
            Re = R0 + (1.0 - R0) * cc ** 5
            Tr = 1.0 - Re
            P = 0.25 + 0.5 * Re
            idx = np.nonzero(fm)[0]

            def sub(m):  # full-length mask from an fm-relative one
                mm = np.zeros(n, dtype=bool)
                mm[idx[m]] = True
                return mm

            emit(sub(tir), refl[tir], np.ones(int(tir.sum())), path[sub(tir)])
            deep = ~tir & (depth1[fm] > 2)
            if deep.any():
                pdraw = u01(pixel[sub(deep)], sample[sub(deep)],
                            path[sub(deep)], depth1[sub(deep)], 5)
                go_r = np.zeros(len(deep), dtype=bool)
                go_r[deep] = pdraw < P[deep]
                go_t = deep & ~go_r
                emit(sub(go_r), refl[go_r], (Re / P)[go_r], path[sub(go_r)])
                emit(sub(go_t), tdir[go_t], (Tr / (1.0 - P))[go_t], path[sub(go_t)])
            split = ~tir & (depth1[fm] <= 2)
            if split.any():
                emit(sub(split), refl[split], Re[split], 2 * path[sub(split)] + 1)
                emit(sub(split), tdir[split], Tr[split], 2 * path[sub(split)] + 2)

        # assemble: continuing rays + per-pixel partial contribution sums
        cont = {k: (np.concatenate(v) if v else np.empty(
            0, dtype=np.int64 if k in ("pixel_id", "sample", "path", "depth")
            else np.float64)) for k, v in out.items()}
        nc = len(cont["pixel_id"])
        uk, inv = np.unique(pixel[hit], return_inverse=True)
        csum = np.zeros((len(uk), 3))
        np.add.at(csum, inv, contrib[hit])
        return pa.table({
            "alive": pa.array(np.concatenate([np.ones(nc, bool),
                                              np.zeros(len(uk), bool)])),
            "pixel_id": pa.array(np.concatenate([cont["pixel_id"], uk])),
            "sample": pa.array(np.concatenate([cont["sample"],
                                               np.zeros(len(uk), np.int64)])),
            "path": pa.array(np.concatenate([cont["path"],
                                             np.zeros(len(uk), np.int64)])),
            **{c: pa.array(np.concatenate([cont[c], np.zeros(len(uk))]))
               for c in ("ox", "oy", "oz", "dx", "dy", "dz")},
            "tr": pa.array(np.concatenate([cont["tr"], csum[:, 0]])),
            "tg": pa.array(np.concatenate([cont["tg"], csum[:, 1]])),
            "tb": pa.array(np.concatenate([cont["tb"], csum[:, 2]])),
            "depth": pa.array(np.concatenate([cont["depth"],
                                              np.zeros(len(uk), np.int64)])),
        })


def first_hits(scene: dict[str, np.ndarray], *, width: int, height: int,
               num_blocks: int | None = None) -> rd.Dataset:
    """Deterministic first-bounce query: per pixel-CENTER camera ray, the
    nearest scene hit (the reference's ``raycast`` scan,
    ``Raytracing.hpp:640-669``) — pure arithmetic, no RNG, so the whole
    thing is DuckDB-expressible and puts the tracer's ray/sphere/slab
    geometry kernels under the driver's SQL gate
    (``oracle.trace_first_hit_sql``).  Output:
    (pixel_id, px, py, hit_id, t_hit) with t_hit floor-rounded to 1e-6
    (the shared engine<->SQL rounding) and hit_id = -1 / t_hit = 0 on a
    miss (never happens in the enclosed Cornell scene, kept for safety).
    """
    scene_ref = ray.put(scene)
    rays = make_camera_rays(width, height, 1, jitter=False)
    ds = rd.from_arrow(rays)
    if num_blocks:
        ds = ds.repartition(num_blocks)
    from optimizing_ray.broadcast import cached

    def fh(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "ox" not in t.column_names:
            return pa.table({"pixel_id": pa.array([], pa.int64()),
                             "px": pa.array([], pa.int64()),
                             "py": pa.array([], pa.int64()),
                             "hit_id": pa.array([], pa.int64()),
                             "t_hit": pa.array([], pa.float64())})
        sc = cached(("tracer_scene", scene_ref.hex()),
                    lambda: ray.get(scene_ref))
        o = np.stack([t[c].to_numpy() for c in ("ox", "oy", "oz")], axis=1)
        d = np.stack([t[c].to_numpy() for c in ("dx", "dy", "dz")], axis=1)
        dist, oid = _raycast_scene(o, d, sc)
        hit = oid >= 0
        pix = t["pixel_id"].to_numpy()
        return pa.table({
            "pixel_id": pa.array(pix),
            "px": pa.array(pix % width), "py": pa.array(pix // width),
            "hit_id": pa.array(oid),
            "t_hit": pa.array(np.where(
                hit, np.floor(dist * 1e6 + 0.5) / 1e6, 0.0)),
        })

    return ds.map_batches(fh, batch_format="pyarrow", zero_copy_batch=True)


def trace(scene: dict[str, np.ndarray], *, width: int, height: int,
          spp: int = 4, max_depth: int = 5, max_bounces: int = 64,
          num_blocks: int | None = None, tail_rows: int = 16_384) -> pa.Table:
    """Render the scene: returns (pixel_id, px, py, r, g, b) with radiance
    mean-over-samples, clamped to [0,1] (A4, ``Raytracing.hpp:485-492``).

    Iterative bounce loop: each round materializes the bounce output
    (bounded: live rays only shrink except the bounded depth<=2 Fresnel
    forks), folds the per-pixel contribution partials into a driver-side
    accumulator (bounded by W x H — the raster_density merge pattern),
    and continues with the survivors.  Terminates when the roulette has
    killed every path (max_bounces is a safety rail, not a truncation in
    practice)."""
    scene_ref = ray.put(scene)
    rays = make_camera_rays(width, height, spp)
    acc = np.zeros((width * height, 3))
    alive: rd.Dataset = rd.from_arrow(rays)
    if num_blocks:
        alive = alive.repartition(num_blocks)

    from optimizing_ray.broadcast import cached

    def bounce_fn(batch, scene_ref=scene_ref, max_depth=max_depth):
        st = cached(("tracer", scene_ref.hex(), max_depth),
                    lambda: _Bounce(scene_ref, max_depth))
        return st(batch)

    def dead_only(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "alive" not in t.column_names:
            z = pa.array([], pa.float64())
            return pa.table({"pixel_id": pa.array([], pa.int64()),
                             "tr": z, "tg": z, "tb": z})
        m = ~t["alive"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(m)).select(["pixel_id", "tr", "tg", "tb"])

    def alive_only(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "alive" not in t.column_names:
            return t
        return t.filter(pa.array(t["alive"].to_numpy(zero_copy_only=False)))

    for _ in range(max_bounces):
        out = alive.map_batches(bounce_fn, batch_format="pyarrow",
                                zero_copy_batch=True).materialize()
        # only the (per-block pixel-aggregated) contribution rows reach the
        # driver — live ray rows never leave the object store
        n_dead = 0
        dead = out.map_batches(dead_only, batch_format="pyarrow",
                               zero_copy_batch=True)
        for ref in dead.to_arrow_refs():
            tbl = ray.get(ref)
            if tbl.num_rows == 0:  # empty blocks can carry an empty schema
                continue
            n_dead += tbl.num_rows
            pix = tbl["pixel_id"].to_numpy()
            acc[pix, 0] += tbl["tr"].to_numpy()
            acc[pix, 1] += tbl["tg"].to_numpy()
            acc[pix, 2] += tbl["tb"].to_numpy()
        n_live = out.count() - n_dead  # count() is metadata on materialized
        if n_live == 0:
            break
        alive = out.map_batches(alive_only, batch_format="pyarrow",
                                zero_copy_batch=True)
        if n_live <= tail_rows:
            # roulette shrinks the live set geometrically; once it fits a
            # single batch the per-bounce Ray dispatch dominates — finish
            # the (bounded) tail locally with the SAME kernel
            kern = _Bounce(scene_ref, max_depth)
            tbl = pa.concat_tables(
                [t for t in ray.get(alive.to_arrow_refs()) if t.num_rows])
            for _ in range(max_bounces):
                if tbl.num_rows == 0:
                    break
                tbl = kern(tbl.drop_columns(["alive"])
                           if "alive" in tbl.column_names else tbl)
                am = tbl["alive"].to_numpy(zero_copy_only=False)
                dead_t = tbl.filter(pa.array(~am))
                pix = dead_t["pixel_id"].to_numpy()
                acc[pix, 0] += dead_t["tr"].to_numpy()
                acc[pix, 1] += dead_t["tg"].to_numpy()
                acc[pix, 2] += dead_t["tb"].to_numpy()
                tbl = tbl.filter(pa.array(am))
            break
    rad = clamp01(acc / spp)
    pix = np.arange(width * height, dtype=np.int64)
    return pa.table({
        "pixel_id": pa.array(pix),
        "px": pa.array(pix % width), "py": pa.array(pix // width),
        "r": pa.array(rad[:, 0]), "g": pa.array(rad[:, 1]), "b": pa.array(rad[:, 2]),
    })
