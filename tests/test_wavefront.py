"""Fused level megakernel (kernels/wavefront.py) vs the general
integrator path, in Pallas interpret mode."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ray_tracying_tpu.render.integrator import trace_wavefront
from ray_tracying_tpu.scene.loader import load_scene_dict

from test_scene_loader import minimal_camera

needs_interpret = pytest.mark.skipif(
    os.environ.get("RTT_SKIP_INTERPRET") == "1", reason="interpret disabled"
)


def wave_scene(roughness=0.0):
    """Qualifying scene: point lights only, reflective, untextured."""
    d = minimal_camera()
    d["lights"] = [
        {"location": [0, 0, 5], "color": [1, 1, 1], "intensity": 300.0},
        {"location": [4, 2, 3], "color": [1.0, 0.8, 0.6], "intensity": 200.0},
    ]
    d["spheres"] = [
        {"location": [0, 6, 0], "radius": 1.5,
         "material": {"diffuse_color": [0.8, 0.2, 0.2],
                      "reflectivity": 0.4, "roughness": roughness}},
        {"location": [-2.5, 7, 1], "radius": 1.0,
         "material": {"diffuse_color": [0.2, 0.6, 0.8]}},
    ]
    d["cubes"] = [
        {"translation": [2.5, 6, -0.5], "rotation": [0.2, 0.4, 0.1],
         "material": {"diffuse_color": [0.9, 0.8, 0.3],
                      "reflectivity": 0.3, "roughness": roughness}},
    ]
    d["rectangles"] = [
        {"translation": [0, 6, -2], "rotation": [0, 0, 0], "scale": [14, 14, 1],
         "material": {"diffuse_color": [0.3, 0.5, 0.3],
                      "reflectivity": 0.2, "roughness": roughness}},
    ]
    return load_scene_dict(d)


def cam_rays(n=256, seed=4):
    rng = np.random.default_rng(seed)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs[:, 1] = np.abs(dirs[:, 1]) + 0.4
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    return jnp.zeros((n, 3)), jnp.asarray(dirs), jnp.zeros(n)


def test_wave_supported_gate():
    from ray_tracying_tpu.kernels.wavefront import wave_supported

    s = wave_scene()
    assert wave_supported(s)
    # one-way refraction qualifies (in-kernel Snell/TIR spawn, r4)
    d = minimal_camera()
    d["lights"] = [{"location": [0, 0, 5], "color": [1, 1, 1], "intensity": 100.0}]
    d["spheres"] = [{"location": [0, 6, 0], "radius": 1.0,
                     "material": {"transparency": 0.5, "refractive_index": 1.5}}]
    assert wave_supported(load_scene_dict(d))
    # a single TWO-WAY material (reflects AND refracts) disqualifies:
    # branching factor 2 breaks the in-slot queue
    d2w = minimal_camera()
    d2w["lights"] = [{"location": [0, 0, 5], "color": [1, 1, 1], "intensity": 100.0}]
    d2w["spheres"] = [{"location": [0, 6, 0], "radius": 1.0,
                       "material": {"transparency": 0.5, "reflectivity": 0.3,
                                    "refractive_index": 1.5}}]
    s2w = load_scene_dict(d2w)
    assert s2w.has_two_way
    assert not wave_supported(s2w)
    # area lights are supported (in-kernel jittered any-hit) — up to the
    # fuzz-row cap of 32 samples x area lights
    d2 = minimal_camera()
    d2["lights"] = [{"location": [0, 0, 5], "color": [1, 1, 1],
                     "intensity": 100.0, "radius": 0.5}]
    d2["spheres"] = [{"location": [0, 6, 0], "radius": 1.0}]
    s2 = load_scene_dict(d2)
    assert wave_supported(s2, light_samples=16)
    assert not wave_supported(s2, light_samples=64)


@needs_interpret
def test_wave_matches_general_path_deterministic():
    """roughness == 0 everywhere: the megakernel path must match the
    general jnp path to float tolerance (same math, different fusion)."""
    s = wave_scene(roughness=0.0)
    o, d, tm = cam_rays()
    key = jax.random.key(5)
    ref = np.asarray(trace_wavefront(s, o, d, tm, key, 1))  # jnp path (CPU)
    os.environ["RTT_PALLAS_INTERPRET"] = "1"
    try:
        got = np.asarray(trace_wavefront(s, o, d, tm, key, 1))
    finally:
        del os.environ["RTT_PALLAS_INTERPRET"]
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)


@needs_interpret
def test_wave_stats_match():
    s = wave_scene(roughness=0.0)
    o, d, tm = cam_rays(seed=9)
    key = jax.random.key(6)
    _, st_ref = trace_wavefront(s, o, d, tm, key, 1, return_stats=True)
    os.environ["RTT_PALLAS_INTERPRET"] = "1"
    try:
        _, st = trace_wavefront(s, o, d, tm, key, 1, return_stats=True)
    finally:
        del os.environ["RTT_PALLAS_INTERPRET"]
    np.testing.assert_array_equal(np.asarray(st.live), np.asarray(st_ref.live))
    np.testing.assert_array_equal(np.asarray(st.hits), np.asarray(st_ref.hits))
    np.testing.assert_array_equal(
        np.asarray(st.spawned), np.asarray(st_ref.spawned)
    )
    assert int(jnp.sum(st.dropped)) == 0


@needs_interpret
def test_wave_glossy_statistical():
    """Glossy fuzz uses the on-core PRNG — a different stream of the same
    distribution; mean radiance must agree statistically."""
    s = wave_scene(roughness=0.35)
    o, d, tm = cam_rays(n=1024, seed=11)
    key = jax.random.key(7)
    ref = np.asarray(trace_wavefront(s, o, d, tm, key, 1))
    os.environ["RTT_PALLAS_INTERPRET"] = "1"
    try:
        got = np.asarray(trace_wavefront(s, o, d, tm, key, 1))
    finally:
        del os.environ["RTT_PALLAS_INTERPRET"]
    assert np.isfinite(got).all()
    # Direct lighting identical; only the glossy bounce differs.
    np.testing.assert_allclose(got.mean(0), ref.mean(0), rtol=0.05, atol=0.01)


@needs_interpret
def test_wave_area_lights_statistical():
    """Area lights route through the wave path (in-kernel jittered
    any-hit).  Jitter streams differ from the general path's, so compare
    statistically; with light_samples=1 the estimator is noisy per-pixel
    but unbiased — compare means over many rays."""
    d = minimal_camera()
    d["lights"] = [
        {"location": [0, 0, 5], "color": [1, 1, 1], "intensity": 300.0,
         "radius": 0.8},
        {"location": [4, 2, 3], "color": [1.0, 0.8, 0.6], "intensity": 200.0},
    ]
    d["spheres"] = [
        {"location": [0, 6, 0], "radius": 1.5,
         "material": {"diffuse_color": [0.8, 0.2, 0.2]}},
        {"location": [-1.0, 4.5, 1.2], "radius": 0.5,
         "material": {"diffuse_color": [0.2, 0.6, 0.8]}},
    ]
    d["rectangles"] = [
        {"translation": [0, 6, -2], "rotation": [0, 0, 0], "scale": [14, 14, 1],
         "material": {"diffuse_color": [0.3, 0.5, 0.3]}},
    ]
    s = load_scene_dict(d)
    from ray_tracying_tpu.kernels.wavefront import wave_supported

    assert wave_supported(s, light_samples=8)
    o, dd, tm = cam_rays(n=2048, seed=13)
    key = jax.random.key(3)
    ref = np.asarray(trace_wavefront(s, o, dd, tm, key, 8))
    os.environ["RTT_PALLAS_INTERPRET"] = "1"
    try:
        got = np.asarray(trace_wavefront(s, o, dd, tm, key, 8))
    finally:
        del os.environ["RTT_PALLAS_INTERPRET"]
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got.mean(0), ref.mean(0), rtol=0.05, atol=0.01)


@needs_interpret
def test_wave_textured_matches_general_path():
    """Textured scenes route through the wave path (in-kernel UV recovery
    + XLA atlas gather); texture sampling is deterministic, so the match
    is to float tolerance — slightly looser than the untextured case
    because the kernel re-derives the local hit point from the Euclidean
    t (t_loc = t/|d|, two extra roundings vs the general path's pass-2
    reconstruction)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from ray_tracying_tpu.scene.loader import load_scene
    from ray_tracying_tpu.kernels.wavefront import wave_supported

    s = load_scene(
        os.path.join(repo, "golden/ASCII/texture.json"),
        textures_dir=os.path.join(repo, "golden/Textures"),
    )
    assert s.has_textures
    assert wave_supported(s)
    o, dd, tm = cam_rays(n=512, seed=21)
    # Aim at the textured objects (camera at origin looking +y misses
    # them); retarget rays from the scene camera position.
    o = jnp.broadcast_to(jnp.asarray([0.0, -4.5, 2.0]), o.shape)
    aim = jnp.asarray([0.0, 0.9, -0.35]) + 0.35 * np.random.default_rng(3).normal(
        size=(o.shape[0], 3)
    ).astype(np.float32)
    dd = aim / jnp.linalg.norm(aim, axis=1, keepdims=True)
    key = jax.random.key(8)
    ref = np.asarray(trace_wavefront(s, o, dd, tm, key, 1))
    os.environ["RTT_PALLAS_INTERPRET"] = "1"
    try:
        got = np.asarray(trace_wavefront(s, o, dd, tm, key, 1))
    finally:
        del os.environ["RTT_PALLAS_INTERPRET"]
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-5)


def glass_scene():
    """One-way refraction + mirrors on DIFFERENT materials: exercises the
    in-kernel Snell/TIR continuation, the exit-flip, and the per-lane
    reflection-vs-refraction pick (Code/raytracer.cpp:118-150,308-344)."""
    d = minimal_camera()
    d["lights"] = [
        {"location": [0, 0, 5], "color": [1, 1, 1], "intensity": 300.0},
        {"location": [4, 2, 3], "color": [1.0, 0.8, 0.6], "intensity": 200.0},
    ]
    d["spheres"] = [
        # glass ball in front of a diffuse backdrop: interior rays exit
        # through the far surface (normal flip) and some graze into TIR
        {"location": [0, 5, 0], "radius": 1.2,
         "material": {"diffuse_color": [0.9, 0.9, 0.9],
                      "transparency": 0.85, "refractive_index": 1.5}},
        {"location": [-2.5, 7, 1], "radius": 1.0,
         "material": {"diffuse_color": [0.2, 0.6, 0.8]}},
    ]
    d["cubes"] = [
        {"translation": [2.5, 6, -0.5], "rotation": [0.2, 0.4, 0.1],
         "material": {"diffuse_color": [0.9, 0.8, 0.3],
                      "reflectivity": 0.35}},
    ]
    d["rectangles"] = [
        {"translation": [0, 8, 0], "rotation": [1.5707963, 0, 0],
         "scale": [14, 14, 1],
         "material": {"diffuse_color": [0.3, 0.5, 0.3]}},
    ]
    return load_scene_dict(d)


@needs_interpret
def test_wave_refraction_matches_general_path():
    """Glass + mirror (one-way mixed) through the fused kernel vs the
    general jnp path: deterministic scene, float tolerance."""
    from ray_tracying_tpu.kernels.wavefront import wave_supported

    s = glass_scene()
    assert s.has_refraction and s.has_reflection and not s.has_two_way
    assert wave_supported(s)
    o, d, tm = cam_rays(n=512, seed=17)
    key = jax.random.key(12)
    ref = np.asarray(trace_wavefront(s, o, d, tm, key, 1))
    os.environ["RTT_PALLAS_INTERPRET"] = "1"
    try:
        got = np.asarray(trace_wavefront(s, o, d, tm, key, 1))
    finally:
        del os.environ["RTT_PALLAS_INTERPRET"]
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)


def test_mixed_one_way_inslot_matches_compacted():
    """A mixed one-way scene (mirror and glass on different materials)
    takes the in-slot queue since r4; forcing compaction must give the
    bit-identical image on a deterministic scene (slot permutation only)."""
    s = glass_scene()
    o, d, tm = cam_rays(n=256, seed=23)
    key = jax.random.key(2)
    a = np.asarray(trace_wavefront(s, o, d, tm, key, 1))
    b = np.asarray(trace_wavefront(s, o, d, tm, key, 1, compact="always"))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_det_scenes_route_through_wave():
    """The reference demo scenes with refraction (det_basic) and deep
    mirrors (det_mirrors) qualify for the fused path since r4."""
    import os as _os

    from ray_tracying_tpu.kernels.wavefront import wave_supported
    from ray_tracying_tpu.scene.loader import load_scene

    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    for name in ("det_basic", "det_mirrors"):
        s = load_scene(_os.path.join(repo, "golden/ASCII", name + ".json"))
        assert wave_supported(s), name


def clustered_rays(n=8192, n_live=2048, seed=31):
    """Rays whose bounce liveness is CONTIGUOUS: the first n_live lanes
    aim at wave_scene's mirror sphere (location [0,6,0], r=1.5) and keep
    spawning; the rest aim away from all geometry and die at level 0.
    Group-granular shrink compaction keeps whole contiguous lane groups,
    so a lossless shrink assertion needs clustered (not scattered)
    liveness — exactly the pattern real scanline+spp ray order produces."""
    rng = np.random.default_rng(seed)
    at = np.array([0.0, 6.0, 0.0]) + 0.3 * rng.normal(size=(n_live, 3))
    live = at / np.linalg.norm(at, axis=1, keepdims=True)
    away = rng.normal(size=(n - n_live, 3))
    away[:, 1] = -np.abs(away[:, 1]) - 0.5  # y<0: below every object...
    away[:, 2] = np.abs(away[:, 2]) + 0.5   # ...and z>0: misses the z=-2 rect
    away /= np.linalg.norm(away, axis=1, keepdims=True)
    dirs = np.concatenate([live, away]).astype(np.float32)
    return jnp.zeros((n, 3)), jnp.asarray(dirs), jnp.zeros(n)


@needs_interpret
def test_wave_shrink_matches_unshrunk():
    """Queue shrinking (group-compact once, deep levels at reduced width)
    must not change a deterministic image when nothing overflows: the
    compaction only re-slots whole lane groups and contributions fold
    back per original group."""
    s = wave_scene(roughness=0.0)
    o, d, tm = clustered_rays(n=8192, n_live=2048, seed=31)
    key = jax.random.key(4)
    os.environ["RTT_PALLAS_INTERPRET"] = "1"
    try:
        base, st0 = trace_wavefront(
            s, o, d, tm, key, 1, shrink=(), return_stats=True
        )
        got, st = trace_wavefront(
            s, o, d, tm, key, 1, shrink=((1, 2), (3, 2)), return_stats=True
        )
    finally:
        del os.environ["RTT_PALLAS_INTERPRET"]
    assert int(np.asarray(st0.live)[1]) > 1024  # the cluster really spawns
    assert int(jnp.sum(st.dropped)) == 0
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(base), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_array_equal(np.asarray(st.live), np.asarray(st0.live))


@needs_interpret
def test_wave_shrink_overflow_counted():
    """Live lanes beyond the shrunk capacity are dropped (dimmest whole
    groups first) and COUNTED — the loss can't be silent.  cam_rays'
    scattered directions keep ~46% of lanes alive across nearly every
    group, far beyond the 1/4 cap."""
    s = wave_scene(roughness=0.0)
    o, d, tm = cam_rays(n=8192, seed=31)
    key = jax.random.key(4)
    os.environ["RTT_PALLAS_INTERPRET"] = "1"
    try:
        _, st = trace_wavefront(
            s, o, d, tm, key, 1, shrink=((1, 4),), return_stats=True
        )
    finally:
        del os.environ["RTT_PALLAS_INTERPRET"]
    live1 = int(np.asarray(st.live)[1])
    spawned0 = int(np.asarray(st.spawned)[0])
    dropped1 = int(np.asarray(st.dropped)[1])
    assert 0 < live1 <= 2048  # kept lanes bounded by the WAVE_BLOCK floor
    assert dropped1 > 0
    assert live1 + dropped1 == spawned0  # every lost lane is accounted


def test_demo_scenes_no_shrink_drops():
    """The auto shrink schedule must never drop a ray on any committed
    demo scene (parity contract).  Checked on the general path's stats
    oracle: live fractions entering each shrink level stay under its
    capacity with >= 1.9x headroom (the flagship enters level 2 at 6.35%
    vs the 12.5% cap)."""
    import os as _os

    from ray_tracying_tpu.render.integrator import WAVE_SHRINK_AUTO
    from ray_tracying_tpu.render.camera import pixel_rays
    from ray_tracying_tpu.scene.loader import load_scene

    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    caps = {}
    cap = 1.0
    for lv, f in WAVE_SHRINK_AUTO:
        cap /= f
        caps[lv] = cap
    for name in ("det_basic", "det_mirrors", "bvh_det", "bvh_glossy",
                 "glossy"):
        s = load_scene(
            _os.path.join(repo, "golden/ASCII", name + ".json"),
            textures_dir=_os.path.join(repo, "golden/Textures"),
        )
        w, h = s.camera.resolution
        xs = (np.arange(w, dtype=np.float32) + 0.5)
        ys = (np.arange(h, dtype=np.float32) + 0.5)
        px, py = np.meshgrid(xs, ys)
        key = jax.random.key(0)
        o, d = pixel_rays(s.camera, px.ravel(), py.ravel(), key)
        tm = jnp.zeros(o.shape[0])
        _, st = trace_wavefront(s, o, d, tm, key, 1, return_stats=True)
        live = np.asarray(st.live).astype(np.float64) / o.shape[0]
        for lv, c in caps.items():
            if lv < live.shape[0]:
                assert live[lv] <= c / 1.9, (name, lv, live[lv], c)


@needs_interpret
def test_wave_no_reflection_single_level():
    d = minimal_camera()
    d["lights"] = [{"location": [0, 0, 5], "color": [1, 1, 1], "intensity": 150.0}]
    d["spheres"] = [{"location": [0, 6, 0], "radius": 1.5,
                     "material": {"diffuse_color": [0.7, 0.3, 0.2]}}]
    s = load_scene_dict(d)
    o, dd, tm = cam_rays(n=64, seed=2)
    key = jax.random.key(1)
    ref = np.asarray(trace_wavefront(s, o, dd, tm, key, 1))
    os.environ["RTT_PALLAS_INTERPRET"] = "1"
    try:
        got = np.asarray(trace_wavefront(s, o, dd, tm, key, 1))
    finally:
        del os.environ["RTT_PALLAS_INTERPRET"]
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)


@needs_interpret
def test_wave_textured_plane_and_many_lights():
    """r5 cliff removal: textured LEGACY PLANES (projective UV from the
    corner columns, in-kernel) and up to 8 lights are fused-path
    eligible; the fused image must match the general path bit-for-near."""
    from ray_tracying_tpu.kernels.wavefront import wave_supported

    d = minimal_camera()
    d["lights"] = [
        {"location": [2.0 * i - 5, -1.0, 2.0 + 0.3 * i],
         "color": [1, 1, 1], "intensity": 80.0 + 10 * i}
        for i in range(6)
    ]
    d["cubes"] = [
        {"translation": [0.5, 5, 0], "rotation": [0.2, 0.3, 0.1],
         "material": {"diffuse_color": [0.9, 0.8, 0.7],
                      "reflectivity": 0.3,
                      "texture_file": "checker.jpg"}},
    ]
    d["planes"] = [
        {"corners": [[-4.0, 8.0, -2.0], [4.0, 8.0, -2.0],
                     [4.0, 8.0, 4.0], [-4.0, 8.0, 4.0]],
         "material": {"diffuse_color": [0.8, 0.8, 0.8],
                      "texture_file": "checker.jpg"}},
    ]
    import os as _os

    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    s = load_scene_dict(
        d, textures_dir=_os.path.join(repo, "golden", "Textures")
    )
    assert wave_supported(s)
    assert s.has_textures and s.n_planes == 1 and s.n_lights == 6

    rng = np.random.default_rng(5)
    dirs = rng.normal(size=(512, 3)).astype(np.float32)
    dirs[:, 1] = np.abs(dirs[:, 1]) + 0.3
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    o = jnp.zeros((512, 3))
    dd = jnp.asarray(dirs)
    tm = jnp.zeros(512)
    key = jax.random.key(2)
    ref = np.asarray(trace_wavefront(s, o, dd, tm, key, 1, fused=False))
    os.environ["RTT_PALLAS_INTERPRET"] = "1"
    try:
        got = np.asarray(trace_wavefront(s, o, dd, tm, key, 1))
    finally:
        del os.environ["RTT_PALLAS_INTERPRET"]
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)


@needs_interpret
def test_wave_return_dropped_scalar():
    """return_dropped surfaces the shrink-overflow count as a scalar with
    the radiance (the render pipeline fetches it per tile and warns from
    the host — device-side debug callbacks don't exist on every backend)."""
    s = wave_scene(roughness=0.0)
    o, d, tm = cam_rays(n=8192, seed=31)
    key = jax.random.key(4)
    os.environ["RTT_PALLAS_INTERPRET"] = "1"
    try:
        out, dropped = trace_wavefront(
            s, o, d, tm, key, 1, shrink=((1, 4),), return_dropped=True
        )
        out2, none_dropped = trace_wavefront(
            s, o, d, tm, key, 1, shrink=(), return_dropped=True
        )
    finally:
        del os.environ["RTT_PALLAS_INTERPRET"]
    assert out.shape == (8192, 3)
    assert int(dropped) > 0       # scattered-live scene overflows 1/4 cap
    assert int(none_dropped) == 0  # lossless when unshrunk
