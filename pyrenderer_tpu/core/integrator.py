"""Wavefront path-tracing integrator: `lax.scan` over bounces on SoA buffers.

This is the TPU-native replacement for the reference's divergent per-pixel
megakernel (reference core/tracing.py:117 PathTracer.trace, launched from
main_taichi.py:89). The reference defined SoA ray/hit buffers but never used
them (core/ray_taichi.py:10-75) — here they are the design: every bounce is
one batched intersection + shading step over the whole wavefront, with
terminated lanes masked instead of diverging.

Estimator modes (cfg.estimator):
  "reference" — reproduces core/tracing.py semantics: emissive hits add the
  hardcoded light color (tracing.py:120,129-139: beta at bounce 0, beta*cos
  after), throughput update attenuation*cos/pdf*(1/pi) with the 0/0 NaN
  guard collapsing to zero (tracing.py:145-149), and NEE without area pdf or
  1/pi: emissive*cos1*cos2/dist^2 (tracing.py:92-108).

  "pbrt" — physically based: scene emission, cosine-weighted lambert with
  correct throughput, NEE with area-measure pdf + power-heuristic MIS
  (the algorithm of taichi_ref.py:368-397 and the unused
  tracing.py:56 sample_direct_lighting2), russian roulette, and the
  metal/dielectric materials of core/bsdf_taichi.py / taichi_ref.py:408-434.

Differentiability: discrete decisions (hit selection, visibility, sampled
directions, RR acceptance) are detached; shading quantities (normals, hit
distances, albedo, emission, geometric terms) stay attached, giving the
standard detached-sampling gradient estimator for d(image)/d(vertices,
albedo, emission).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pyrenderer_tpu import rng
from pyrenderer_tpu.config import RenderConfig
from pyrenderer_tpu.core import intersect as isect
from pyrenderer_tpu.core import sampling
from pyrenderer_tpu.core.camera import generate_rays
from pyrenderer_tpu.core.sampling import INV_PI
from pyrenderer_tpu.scene.types import Camera, Scene

sg = jax.lax.stop_gradient

# Reference tracing.py:120 — emissive surfaces contribute this hardcoded
# color in "reference" estimator mode (scene emission is ignored there).
REF_LIGHT_COLOR = (0.9, 0.85, 0.7)


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _safe_normalize(v):
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.where(n == 0, 1.0, n)


def _face_normal(scene: Scene, tri, e1, e2):
    """Geometric normal = sign * normalize(cross(e1, e2)) (reference
    shapes.py:43-47: quads negated, cubes positive)."""
    n = _safe_normalize(jnp.cross(e1, e2))
    return scene.normal_sign[tri][:, None] * n


def _sample_light_point(scene: Scene, pixel_id, sample_id, bounce, seed, dtype):
    """Uniform light prim -> uniform face -> sqrt-barycentric point.

    Reference: intersection_taichi.py:194 sample_a_light (uniform prim pick)
    -> shapes.py:63 sample_a_point (randInt face, sqrt-barycentric).
    Returns (p2, n2, light_mat) — all (N, ...) arrays.
    """
    n_lights = scene.n_lights
    if n_lights > 1:
        up = rng.uniform(seed, pixel_id, sample_id, bounce, rng.U_LIGHT_PRIM, dtype)
        li = jnp.clip((up * n_lights).astype(jnp.int32), 0, n_lights - 1)
    else:
        li = jnp.zeros_like(pixel_id, jnp.int32)
    nf = scene.light_nfaces[li]
    uf = rng.uniform(seed, pixel_id, sample_id, bounce, rng.U_LIGHT_FACE, dtype)
    fi = jnp.clip((uf * nf.astype(dtype)).astype(jnp.int32), 0, nf - 1)
    lf = scene.light_faces[li, fi]
    f = scene.faces[lf]
    v0 = scene.vertices[f[:, 0]]
    v1 = scene.vertices[f[:, 1]]
    v2 = scene.vertices[f[:, 2]]
    u = rng.uniform(seed, pixel_id, sample_id, bounce, rng.U_LIGHT_U, dtype)
    v = rng.uniform(seed, pixel_id, sample_id, bounce, rng.U_LIGHT_V, dtype)
    p2 = sampling.sample_triangle_point(v0, v1, v2, u, v)
    n2 = _face_normal(scene, lf, v1 - v0, v2 - v0)
    return p2, n2, scene.face_material[lf]


def trace_reference(
    scene: Scene,
    cfg: RenderConfig,
    ro,
    rd,
    pixel_id,
    sample_id,
    seed: int,
    tri_matrix=None,
    use_matmul: bool = True,
    with_stats: bool = False,
):
    """Radiance for a wavefront of rays, 'reference' estimator semantics.

    ro, rd: (N, 3); pixel_id, sample_id: (N,) uint32. Returns (N, 3), or
    (radiance, rays_traced) when with_stats — rays_traced counts closest-hit
    rays for live lanes plus NEE shadow rays (the honest Mrays/s numerator;
    masked-dead lanes are excluded even though the SIMD work still happens).
    """
    dtype = ro.dtype
    n = ro.shape[0]
    if use_matmul and tri_matrix is None:
        tri_matrix = isect.build_tri_matrix(scene)

    def closest(o, d, t1):
        if use_matmul:
            return isect.intersect_matmul(scene, o, d, cfg.t_min, t1, tri_matrix)
        return isect.intersect_brute(scene, o, d, cfg.t_min, t1)

    def any_hit(o, d, t1):
        if use_matmul:
            return isect.occluded_matmul(scene, o, d, cfg.t_min, t1, tri_matrix)
        return isect.occluded(scene, o, d, cfg.t_min, t1)

    light_color = jnp.asarray(REF_LIGHT_COLOR, dtype)

    def bounce_step(state, bounce):
        ro, rd, beta, radiance, alive, n_rays = state
        n_rays = n_rays + jnp.sum(alive, dtype=jnp.float32)

        hit, _, tri = closest(ro, rd, cfg.t_max)
        tri = sg(tri)
        hit = sg(hit)

        # Differentiable re-evaluation of the selected triangle's geometry.
        f = scene.faces[tri]
        v0 = scene.vertices[f[:, 0]]
        v1 = scene.vertices[f[:, 1]]
        v2 = scene.vertices[f[:, 2]]
        e1 = v1 - v0
        e2 = v2 - v0
        c_e1_d = jnp.cross(e1, rd)
        det = _dot(c_e1_d, e2)
        safe_det = jnp.where(det == 0, 1.0, det)
        s = ro - v0
        c_s_e2 = jnp.cross(s, e2)
        t = -_dot(c_s_e2, e1) / safe_det
        p = ro + t[:, None] * rd

        n_geo = _face_normal(scene, tri, e1, e2)
        mat = scene.face_material[tri]
        emissive = scene.emissive[mat] > 0
        sided = scene.sided[mat] > 0
        flip = (~sided) & (_dot(n_geo, -rd) < 0)
        nrm = jnp.where(flip[:, None], -n_geo, n_geo)

        # Emissive hit (reference tracing.py:129-139): hardcoded light color,
        # weight 1 at bounce 0, cos afterwards; path terminates either way.
        d1 = _dot(-rd, nrm)
        is_light_hit = alive & hit & emissive
        le_weight = jnp.where(bounce == 0, jnp.ones_like(d1), d1)
        add_light = (is_light_hit & (d1 > 0))[:, None]
        radiance = radiance + jnp.where(add_light, light_color * beta * le_weight[:, None], 0.0)

        alive = alive & hit & (~emissive)

        # Lambert cosine sample in the shading frame (reference bsdf.py:30
        # scatter + shapes.py:105-109 frame rotation; pdf = |n·wi|/pi).
        u1 = rng.uniform(seed, pixel_id, sample_id, bounce, rng.U_BSDF_0, dtype)
        u2 = rng.uniform(seed, pixel_id, sample_id, bounce, rng.U_BSDF_1, dtype)
        wi_local = sampling.cosine_sample_hemisphere(u1, u2)
        wi = sg(sampling.rotate_z_to(nrm, wi_local))
        cos_wi = _dot(nrm, wi)
        pdf = sg(jnp.abs(cos_wi)) * INV_PI

        albedo = scene.albedo[mat]
        # tracing.py:145-149: attenuation*cos/pdf*(1/pi); NaN guard (0/0 when
        # n·wi == 0) recomputes with pdf=1e-4, which yields exactly 0.
        safe_pdf = jnp.where(pdf == 0, 1.0, pdf)
        scale = jnp.maximum(0.0, cos_wi) / safe_pdf * INV_PI
        new_beta = jnp.where((cos_wi != 0)[:, None], albedo * scale[:, None], 0.0)
        beta = jnp.where(alive[:, None], beta * new_beta, beta)

        # NEE (reference tracing.py:92-108): single light point, geometric
        # coupling emissive*cos1*cos2/dist^2, visibility by shadow ray.
        # Divergence from reference: distance along the ray (norm) instead of
        # the x-component ratio (tracing.py:100), and a relative margin so the
        # sampled light face itself never occludes.
        p2, n2, light_mat = _sample_light_point(
            scene, pixel_id, sample_id, bounce, seed, dtype
        )
        to_light = p2 - p
        dist_sq = jnp.maximum(_dot(to_light, to_light), 1e-12)
        dist = jnp.sqrt(dist_sq)
        w = to_light / dist[:, None]
        occ = any_hit(sg(p), sg(w), sg(dist) * (1.0 - cfg.shadow_eps))
        n_rays = n_rays + jnp.sum(alive, dtype=jnp.float32)
        dot1 = _dot(nrm, w)
        dot2 = _dot(n2, -w)
        # reference evaluate(): emitter albedo as a vec3 (core/bsdf.py:54)
        em = scene.albedo[light_mat]
        nee_ok = (alive & (~occ) & (dot1 > 0) & (dot2 > 0))[:, None]
        contrib = em * (dot1 * dot2 / dist_sq)[:, None]
        radiance = radiance + jnp.where(nee_ok, beta * contrib, 0.0)

        ro = jnp.where(alive[:, None], p, ro)
        rd = jnp.where(alive[:, None], wi, rd)
        return (ro, rd, beta, radiance, alive, n_rays), None

    # Carries are derived from `ro` (not fresh constants) so that under
    # shard_map they inherit the mesh-varying type the scan body produces.
    zeros = ro * 0
    init = (
        ro,
        rd,
        zeros + 1.0,                            # beta
        zeros,                                  # radiance
        zeros[:, 0] == 0,                       # alive (all True)
        jnp.sum(zeros[:, 0]).astype(jnp.float32),  # n_rays
    )
    (ro, rd, beta, radiance, alive, n_rays), _ = jax.lax.scan(
        bounce_step, init, jnp.arange(cfg.max_bounces, dtype=jnp.uint32)
    )
    if with_stats:
        return radiance, n_rays
    return radiance


def render_sample(
    scene: Scene,
    camera: Camera,
    cfg: RenderConfig,
    seed: int,
    sample_id,
    pixel_x,
    pixel_y,
    tri_matrix=None,
):
    """Radiance for one sample of a block of pixels. pixel_x/y: (N,) int32."""
    w, _h = camera.resolution
    pixel_id = (pixel_y * w + pixel_x).astype(jnp.uint32)
    sample_arr = jnp.full_like(pixel_id, sample_id) if jnp.ndim(sample_id) == 0 else sample_id
    ro, rd = generate_rays(camera, pixel_x, pixel_y, sample_arr, seed)
    if cfg.estimator == "reference":
        return trace_reference(
            scene, cfg, ro, rd, pixel_id, sample_arr, seed, tri_matrix=tri_matrix
        )
    from pyrenderer_tpu.core.integrator_pbrt import trace_pbrt

    return trace_pbrt(
        scene, cfg, ro, rd, pixel_id, sample_arr, seed, tri_matrix=tri_matrix
    )


@partial(jax.jit, static_argnames=("cfg", "seed", "spp"))
def render_block(scene, camera, cfg: RenderConfig, seed: int, spp: int, pixel_x, pixel_y):
    """Mean radiance over `spp` samples for a pixel block — one jitted unit."""
    tri_matrix = isect.build_tri_matrix(scene)

    def one_sample(s):
        return render_sample(
            scene, camera, cfg, seed, s, pixel_x, pixel_y, tri_matrix=tri_matrix
        )

    total = jax.lax.map(one_sample, jnp.arange(spp, dtype=jnp.uint32)).sum(axis=0)
    return total / spp


def render_image(
    scene: Scene,
    camera: Camera,
    cfg: RenderConfig,
    chunk: int = 1 << 16,
):
    """Full-frame mean-radiance HDR image, (H, W, 3), row 0 at the top.

    Host-side loop over pixel chunks; each chunk is one jitted
    render_block. Progressive/accumulating rendering lives in
    render/driver.py — this is the simple whole-frame entry.
    """
    w, h = camera.resolution
    ys, xs = jnp.mgrid[0:h, 0:w]
    xs = xs.reshape(-1).astype(jnp.int32)
    ys = ys.reshape(-1).astype(jnp.int32)
    out = []
    for start in range(0, w * h, chunk):
        px = xs[start : start + chunk]
        py = ys[start : start + chunk]
        out.append(render_block(scene, camera, cfg, cfg.seed, cfg.spp, px, py))
    img = jnp.concatenate(out).reshape(h, w, 3)
    # pixel y counts up from the bottom (taichi GUI convention,
    # main_taichi.py:89); flip so row 0 is the top of the image.
    return img[::-1]
