"""Multi-bounce path tracer: the distributed breadth-first bounce loop
must reproduce a scalar single-threaded depth-first recursion of the
reference's compute_radiance rule (Raytracing.hpp:501-638) bit-for-bit
modulo per-pixel summation order."""

import numpy as np
import pytest

from optimizing_ray.pipelines import tracer
from optimizing_ray.pipelines.tracer import (
    CUBE, DIFFUSE, REFRACTION, SPECULAR, SPHERE, u01_scalar)


def _scalar_raycast(sc, o, d):
    dist, oid = tracer._raycast_scene(o[None, :], d[None, :], sc)
    return float(dist[0]), int(oid[0])


def _radiance(sc, o, d, pixel, sample, path, depth, max_depth):
    """Depth-first scalar twin of the bounce kernel (the reference
    recursion with the engine's counter RNG)."""
    dist, oid = _scalar_raycast(sc, o, d)
    if oid < 0:
        return np.zeros(3)
    x = o + d * dist
    e = np.asarray([sc["er"][oid], sc["eg"][oid], sc["eb"][oid]])
    f0 = np.asarray([sc["cr"][oid], sc["cg"][oid], sc["cb"][oid]])
    mat = int(sc["material"][oid])
    if sc["type"][oid] == SPHERE:
        c = np.asarray([sc["px"][oid], sc["py"][oid], sc["pz"][oid]])
        n = (x - c) / np.linalg.norm(x - c)
    else:
        bmin = np.asarray([sc["px"][oid], sc["py"][oid], sc["pz"][oid]])
        half = np.asarray([sc["sx"][oid], sc["sy"][oid], sc["sz"][oid]]) * 0.5
        dd = x - (bmin + half)
        aa = np.abs(dd)
        n = np.zeros(3)
        if aa[0] > aa[1] and aa[0] > aa[2]:
            n[0] = 1.0 if dd[0] > 0 else -1.0
        elif aa[1] > aa[2]:
            n[1] = 1.0 if dd[1] > 0 else -1.0
        else:
            n[2] = 1.0 if dd[2] > 0 else -1.0

    depth1 = depth + 1
    thr = f0.max()
    f = f0
    if depth1 > max_depth:
        if thr > 0 and u01_scalar(pixel, sample, path, depth1, 2) < thr:
            f = f0 / thr
        else:
            return e
    nl = n if float(n @ d) < 0 else -n

    if mat == DIFFUSE:
        r1 = 2.0 * np.pi * u01_scalar(pixel, sample, path, depth1, 3)
        r2 = u01_scalar(pixel, sample, path, depth1, 4)
        r2s = np.sqrt(r2)
        w = nl
        up = np.asarray([0.0, 1.0, 0.0]) if abs(w[0]) > 0.1 else \
            np.asarray([1.0, 0.0, 0.0])
        u = np.cross(up, w)
        u = u / np.linalg.norm(u)
        v = np.cross(w, u)
        nd = u * np.cos(r1) * r2s + v * np.sin(r1) * r2s + w * np.sqrt(1 - r2)
        nd = nd / np.linalg.norm(nd)
        return e + f * _radiance(sc, x, nd, pixel, sample, path, depth1, max_depth)
    if mat == SPECULAR:
        refl = d - n * 2.0 * float(n @ d)
        return e + f * _radiance(sc, x, refl, pixel, sample, path, depth1, max_depth)
    # REFRACTION
    refl = d - n * 2.0 * float(n @ d)
    into = float(n @ nl) > 0
    nnt = 1.0 / 1.5 if into else 1.5
    ddn = float(d @ nl)
    cos2t = 1.0 - nnt * nnt * (1.0 - ddn * ddn)
    if cos2t < 0:  # total internal reflection
        return e + f * _radiance(sc, x, refl, pixel, sample, path, depth1, max_depth)
    tdir = d * nnt - n * ((1.0 if into else -1.0) * (ddn * nnt + np.sqrt(cos2t)))
    tdir = tdir / np.linalg.norm(tdir)
    R0 = 0.04
    cc = 1.0 - (-ddn if into else float(tdir @ n))
    Re = R0 + (1.0 - R0) * cc ** 5
    Tr = 1.0 - Re
    P = 0.25 + 0.5 * Re
    if depth1 > 2:
        if u01_scalar(pixel, sample, path, depth1, 5) < P:
            return e + f * (Re / P) * _radiance(sc, x, refl, pixel, sample,
                                                path, depth1, max_depth)
        return e + f * (Tr / (1.0 - P)) * _radiance(sc, x, tdir, pixel, sample,
                                                    path, depth1, max_depth)
    return e + f * (Re * _radiance(sc, x, refl, pixel, sample, 2 * path + 1,
                                   depth1, max_depth)
                    + Tr * _radiance(sc, x, tdir, pixel, sample, 2 * path + 2,
                                     depth1, max_depth))


W = H = 16
SPP = 2


def test_trace_matches_scalar_recursion(ray_session):
    sc = tracer.cornell_scene()
    got = tracer.trace(sc, width=W, height=H, spp=SPP, max_depth=5,
                       num_blocks=4).to_pandas().sort_values("pixel_id")

    rays = tracer.make_camera_rays(W, H, SPP).to_pandas()
    acc = np.zeros((W * H, 3))
    for row in rays.itertuples():
        o = np.asarray([row.ox, row.oy, row.oz])
        d = np.asarray([row.dx, row.dy, row.dz])
        acc[row.pixel_id] += _radiance(sc, o, d, row.pixel_id, row.sample,
                                       0, 0, 5)
    want = np.clip(acc / SPP, 0.0, 1.0)

    np.testing.assert_allclose(
        got[["r", "g", "b"]].to_numpy(), want, rtol=0, atol=1e-9)
    # the render is not degenerate: lit pixels exist and differ
    assert got[["r", "g", "b"]].to_numpy().max() > 0.1
    assert len(np.unique(got["r"].to_numpy())) > 10


def test_trace_depth_zero_budget_is_emission_only(ray_session):
    """max_depth=0 puts every ray under roulette immediately; with a
    black-colour light the expected image is the direct-hit emission."""
    sc = tracer.cornell_scene()
    out = tracer.trace(sc, width=8, height=8, spp=1, max_depth=0,
                       max_bounces=8).to_pandas()
    # all finite, clamped
    v = out[["r", "g", "b"]].to_numpy()
    assert np.isfinite(v).all() and (v >= 0).all() and (v <= 1).all()


def test_scene_has_all_materials_and_a_cube():
    sc = tracer.cornell_scene()
    assert set(np.unique(sc["material"])) == {DIFFUSE, SPECULAR, REFRACTION}
    assert (sc["type"] == CUBE).sum() == 1


def test_trace_is_partition_invariant(ray_session):
    """The distributed bounce loop must give IDENTICAL radiance regardless
    of how the ray table is partitioned (counter RNG + per-pixel sums are
    block-order-free) — the distributed-correctness property that lets a
    256-node run reproduce a 1-node run."""
    sc = tracer.cornell_scene()
    a = tracer.trace(sc, width=8, height=8, spp=2, num_blocks=1) \
        .to_pandas().sort_values("pixel_id").reset_index(drop=True)
    b = tracer.trace(sc, width=8, height=8, spp=2, num_blocks=7) \
        .to_pandas().sort_values("pixel_id").reset_index(drop=True)
    np.testing.assert_allclose(a[["r", "g", "b"]].to_numpy(),
                               b[["r", "g", "b"]].to_numpy(), rtol=0, atol=1e-12)
