"""Sampled-spectral machinery tests (spectrum.rs:2398-2749).

Checks the 60-bin CIE reduction, RGB->spectrum->RGB roundtrips through
the Smits bases, luminance consistency, blackbody physics, and that
sampled-spectral rendering of a conductor differs from the RGB pipeline
(the whole point of the mode).
"""

import numpy as np
import jax.numpy as jnp

from rs_ray_toy_tpu.core import cie_data as cd
from rs_ray_toy_tpu.core import spectral as sp


def test_cie_tables_sane():
    assert len(cd.CIE_X) == len(cd.CIE_Y) == len(cd.CIE_LAMBDA) == 471
    assert cd.CIE_LAMBDA[0] == 360 and cd.CIE_LAMBDA[-1] == 830
    # Y integral over wavelength equals the published constant
    np.testing.assert_allclose(
        np.trapezoid(cd.CIE_Y, cd.CIE_LAMBDA), cd.CIE_Y_INTEGRAL, rtol=1e-5
    )


def test_average_spectrum_samples_analytic():
    lam = np.array([0.0, 1.0, 2.0])
    vals = np.array([0.0, 1.0, 2.0])  # f(x) = x
    # average of x over [0.5, 1.5] = 1.0
    np.testing.assert_allclose(
        sp.average_spectrum_samples(lam, vals, 0.5, 1.5), 1.0
    )
    # constant extension below/above
    np.testing.assert_allclose(
        sp.average_spectrum_samples(lam, vals, -2.0, -1.0), 0.0
    )
    np.testing.assert_allclose(
        sp.average_spectrum_samples(lam, vals, 5.0, 6.0), 2.0
    )
    # straddling: avg over [-1, 1] = (1*0 + 0.5)/2
    np.testing.assert_allclose(
        sp.average_spectrum_samples(lam, vals, -1.0, 1.0), 0.25
    )


def test_white_reflectance_is_flat():
    """from_rgb(white, Reflectance) must be a nearly flat unit spectrum
    (a perfect reflector): 0.94 x the ~1.062 Smits white basis.  (Note
    its to_rgb is NOT (1,1,1): a flat reflectance is illuminant-E white,
    which the sRGB/D65 matrix maps to (1.20, 0.95, 0.91) — the reference
    behaves identically.)"""
    for scale in (1.0, 0.5):
        s = sp.from_rgb(
            jnp.asarray([scale] * 3, jnp.float32), sp.REFLECTANCE
        )
        assert s.shape == (60,)
        arr = np.asarray(s)
        np.testing.assert_allclose(arr.mean(), 0.998 * scale, rtol=5e-3)
        assert arr.std() < 0.01 * max(arr.mean(), 1e-9)


def test_colored_reflectance_roundtrip():
    rng = np.random.default_rng(0)
    rgb = rng.uniform(0.05, 0.95, size=(32, 3)).astype(np.float32)
    s = sp.from_rgb(jnp.asarray(rgb), sp.REFLECTANCE)
    assert np.all(np.asarray(s) >= 0.0)
    # the Smits fit reproduces tristimulus values approximately: compare
    # in XYZ (measured this session: max err 0.092, mean 0.027)
    from rs_ray_toy_tpu.core import spectrum as spec3

    xyz_s = np.asarray(sp.to_xyz(s))
    xyz_d = np.asarray(spec3.rgb_to_xyz(jnp.asarray(rgb)))
    assert np.abs(xyz_s - xyz_d).max() < 0.12
    assert np.abs(xyz_s - xyz_d).mean() < 0.04
    # luminance consistent with the XYZ path
    np.testing.assert_allclose(
        np.asarray(sp.y(s)), xyz_s[:, 1], rtol=1e-5, atol=1e-6
    )


def test_illuminant_roundtrip():
    """The illuminant bases are D65-referenced: rgb roundtrips
    hue-faithfully with a ~0.92 brightness factor (measured; the
    reference's 0.86445 scale x basis shape)."""
    rgb = jnp.asarray([[1.0, 0.8, 0.6]], jnp.float32)
    s = sp.from_rgb(rgb, sp.ILLUMINANT)
    back = np.asarray(sp.to_rgb(s))[0]
    ratio = back / np.asarray([1.0, 0.8, 0.6])
    assert abs(ratio.mean() - 0.92) < 0.05
    assert ratio.max() - ratio.min() < 0.06  # hue preserved


def test_blackbody_physics():
    lam = sp.sampled_bin_wavelengths()
    le = sp.blackbody(lam, 6000.0)
    assert np.all(le > 0)
    # Wien displacement: 6000K peaks at ~483nm — inside our band, so the
    # normalized curve must peak strictly inside, near 483
    len_ = sp.blackbody_normalized(lam, 6000.0)
    peak = lam[np.argmax(len_)]
    assert abs(peak - 483.0) < 6.0
    assert len_.max() <= 1.0 + 1e-9
    # hotter bodies emit more at every wavelength
    le_hot = sp.blackbody(lam, 8000.0)
    assert np.all(le_hot > le)


def test_resample_matches_bin_average():
    # resampling the CIE Y curve: every bin average must lie within the
    # curve's local min/max over that bin
    t = sp.tables()
    lam = np.asarray(cd.CIE_LAMBDA)
    for i in (0, 20, 59):
        wl0 = 400 + 300 * i / 60
        wl1 = 400 + 300 * (i + 1) / 60
        m = (lam >= wl0 - 1) & (lam <= wl1 + 1)
        assert cd.CIE_Y[m].min() - 1e-9 <= t["y"][i] <= cd.CIE_Y[m].max() + 1e-9


def test_spectral_conductor_differs_from_rgb():
    """Fresnel conductor reflectance computed per-wavelength from the
    sampled copper n/k, then converted to RGB, must differ measurably
    from the RGB pipeline's 3-channel approximation — the visible payoff
    of the spectral mode (metal.rs copper constants)."""
    from rs_ray_toy_tpu.scene.loader import (
        _COPPER_WAVELENGTHS, _COPPER_N, _COPPER_K, COPPER_N_RGB, COPPER_K_RGB,
    )
    from rs_ray_toy_tpu.bsdf.eval import fr_conductor

    # spectral: resample n/k to 60 bins, evaluate Fresnel per bin
    n60 = sp.resample_to_bins(_COPPER_WAVELENGTHS, _COPPER_N)
    k60 = sp.resample_to_bins(_COPPER_WAVELENGTHS, _COPPER_K)
    cos_i = jnp.asarray([0.3, 0.7, 1.0], jnp.float32)
    fr_spec = np.asarray(
        fr_conductor(
            cos_i,
            jnp.asarray(np.tile(n60, (3, 1)), jnp.float32),
            jnp.asarray(np.tile(k60, (3, 1)), jnp.float32),
        )
    )  # (3 angles, 60)
    rgb_spec = np.asarray(sp.to_rgb(jnp.asarray(fr_spec, jnp.float32)))

    fr_rgb = np.asarray(
        fr_conductor(
            cos_i,
            jnp.asarray(np.tile(COPPER_N_RGB, (3, 1)), jnp.float32),
            jnp.asarray(np.tile(COPPER_K_RGB, (3, 1)), jnp.float32),
        )
    )
    # both are copper-ish (r > b) ...
    assert np.all(rgb_spec[:, 0] > rgb_spec[:, 2])
    assert np.all(fr_rgb[:, 0] > fr_rgb[:, 2])
    # ... but the per-wavelength integration differs measurably
    assert np.abs(rgb_spec - fr_rgb).max() > 0.01


def test_spectral_render_end_to_end():
    """Path-render scene.json in sampled-spectral mode: finite output,
    close to the RGB render for matte scenes (the Smits lift is
    near-exact for smooth reflectances) but not identical."""
    import json, os, shutil, tempfile

    from rs_ray_toy_tpu.scene.loader import load_scene
    from rs_ray_toy_tpu.render import render_job

    cfg = json.load(open("/root/reference/samples/scene.json"))
    cfg["Film"]["xres"], cfg["Film"]["yres"] = 40, 24
    cfg["Integrator"] = {"integrator_type": "Path", "max_depth": 3}
    for p in cfg["Aggregate"]["primitives"]:
        p["material_name"] = "mat_matte"
    # matte kd must be constant (textured params are outside the spectral
    # subset); scene.json's mat_matte already is
    td = tempfile.mkdtemp()
    shutil.copy("/root/reference/samples/cube.obj", td)
    path = os.path.join(td, "s.json")
    json.dump(cfg, open(path, "w"))

    job_rgb = load_scene(path)
    job_spec = load_scene(path, spectral=True)
    assert job_spec.scene.n_channels == 60

    rgb = np.asarray(
        render_job(job_rgb, spp_override=2, pupil_samples=1 << 10, seed=0)[
            "rgb_srgb_input"
        ]
    )
    spc = np.asarray(
        render_job(job_spec, spp_override=2, pupil_samples=1 << 10, seed=0)[
            "rgb_srgb_input"
        ]
    )
    assert np.isfinite(spc).all() and spc.max() > 0
    lit = rgb.sum(-1) > 1e-3
    assert lit.sum() > 25
    # same scene, same estimator, different color pipeline: images agree
    # in structure and overall energy, differ in per-channel detail
    ratio = spc[lit].sum() / rgb[lit].sum()
    assert 0.8 < ratio < 1.25, ratio
    assert np.abs(spc - rgb).max() > 1e-4  # actually spectral


def test_spectral_metal_render_differs_more():
    """The copper conductor is where RGB vs sampled-spectral visibly
    diverge (per-wavelength Fresnel vs 3-channel): the spectral render's
    hue shift must exceed the matte scene's."""
    import json, os, shutil, tempfile

    from rs_ray_toy_tpu.scene.loader import load_scene
    from rs_ray_toy_tpu.render import render_job

    def render_pair(material):
        cfg = json.load(open("/root/reference/samples/scene.json"))
        cfg["Film"]["xres"], cfg["Film"]["yres"] = 40, 24
        cfg["Integrator"] = {"integrator_type": "Path", "max_depth": 3}
        for p in cfg["Aggregate"]["primitives"]:
            p["material_name"] = material
        td = tempfile.mkdtemp()
        shutil.copy("/root/reference/samples/cube.obj", td)
        path = os.path.join(td, "s.json")
        json.dump(cfg, open(path, "w"))
        out = []
        for spectral in (False, True):
            job = load_scene(path, spectral=spectral)
            out.append(
                np.asarray(
                    render_job(
                        # spp 4: at 2 the lit set of this dark specular
                        # scene sat at ~10 pixels and any sampler change
                        # (e.g. the r3 stratum-permutation fix) flipped
                        # the >12 gate
                        job, spp_override=4, pupil_samples=1 << 10, seed=0
                    )["rgb_srgb_input"]
                )
            )
        return out

    rgb_m, spc_m = render_pair("mat_metal")
    # 3e-4: the metal-everything scene is dark and film averaging pushes
    # single-hit speculars below 1e-3 as spp grows; at 3e-4/spp-4 the
    # lit set is ~30 pixels and stable against sampler changes
    lit = rgb_m.sum(-1) > 3e-4
    assert lit.sum() > 12
    # hue comparison on lit pixels
    def hue(img):
        v = img[lit]
        return v / np.maximum(v.sum(-1, keepdims=True), 1e-9)

    dh_metal = np.abs(hue(spc_m) - hue(rgb_m)).mean()
    assert np.isfinite(spc_m).all()
    assert dh_metal > 1e-3, f"spectral copper shows no hue shift ({dh_metal})"


def _spectral_pair(mutate, spp=2, seed=0):
    import json, os, shutil, tempfile

    from rs_ray_toy_tpu.scene.loader import load_scene
    from rs_ray_toy_tpu.render import render_job

    cfg = json.load(open("/root/reference/samples/scene.json"))
    cfg["Film"]["xres"], cfg["Film"]["yres"] = 40, 24
    mutate(cfg)
    td = tempfile.mkdtemp()
    shutil.copy("/root/reference/samples/cube.obj", td)
    shutil.copy("/root/reference/samples/s_01.png", td)
    path = os.path.join(td, "s.json")
    json.dump(cfg, open(path, "w"))
    rgb = np.asarray(
        render_job(load_scene(path), spp_override=spp, pupil_samples=1 << 10,
                   seed=seed)["rgb_srgb_input"]
    )
    spc = np.asarray(
        render_job(load_scene(path, spectral=True), spp_override=spp,
                   pupil_samples=1 << 10, seed=seed)["rgb_srgb_input"]
    )
    return rgb, spc


def test_spectral_volpath_grid_fog():
    """Round-3 spectral completion: a config-4-style fog scene renders in
    N=60 mode through VolPath (medium sigma lifted via the Smits basis)
    and agrees with the RGB render in aggregate energy — the fog spectra
    are smooth so the lift is near-exact."""

    def mut(cfg):
        cfg["Integrator"] = {"integrator_type": "Volpath", "max_depth": 3}
        for p in cfg["Aggregate"]["primitives"]:
            p["material_name"] = "mat_matte"
        # thin grid fog across the scene (the Homogeneous default sigma is
        # opaque over this scene's 40+ unit distances)
        cfg["Camera"]["medium"] = {
            "medium_type": "GridDensity", "g": 0.0, "nx": 1, "d": [0.004],
            "world_pos": [-100.0, -100.0, -100.0], "scale": 250.0,
        }

    rgb, spc = _spectral_pair(mut)
    assert np.isfinite(spc).all() and spc.max() > 0
    lit = rgb.sum(-1) > 1e-3
    assert lit.sum() > 15  # lens vignetting keeps the lit area small
    ratio = spc[lit].sum() / rgb[lit].sum()
    assert 0.7 < ratio < 1.4, ratio


def test_spectral_env_light_escape():
    """Infinite lights in spectral mode: env radiance is lifted to 60
    bins; escaped rays and NEE agree with the RGB render for a constant
    (flat-spectrum) environment."""

    def mut(cfg):
        cfg["Integrator"] = {"integrator_type": "Path", "max_depth": 3}
        for p in cfg["Aggregate"]["primitives"]:
            p["material_name"] = "mat_matte"
        cfg["lights"] = [
            {"light_type": "infinite", "l": {"values": [1.0, 1.0, 1.0]}}
        ]
        cfg["infinite_lights"] = [
            {"light_type": "infinite", "l": {"values": [1.0, 1.0, 1.0]}}
        ]

    rgb, spc = _spectral_pair(mut)
    assert np.isfinite(spc).all()
    # escaped pixels read the env exactly.  A flat spectrum is NOT white
    # after the CIE reduction (equal-energy XYZ ~ (1,1,1) -> sRGB is
    # warm) — the reference's spectrum.rs pipeline has the same tint, so
    # compare against the pipeline's own white roundtrip per channel.
    import jax.numpy as jnp

    from rs_ray_toy_tpu.core import spectral as sp

    tint = np.asarray(
        sp.to_rgb(sp.from_rgb(jnp.ones((1, 3), jnp.float32), sp.REFLECTANCE))
    )[0]
    esc = rgb.min(-1) > 0.5
    assert esc.sum() > 50  # lens vignetting blacks out the film borders
    assert np.abs(spc[esc] - rgb[esc] * tint).max() < 0.02, (
        tint,
        np.abs(spc[esc] - rgb[esc] * tint).max(),
    )


def test_spectral_textured_matte():
    """Textured kd (image map) in spectral mode: per-hit device from_rgb
    lift.  The textured cubes must render non-black and track the RGB
    image in aggregate energy."""

    def mut(cfg):
        cfg["Integrator"] = {"integrator_type": "Path", "max_depth": 3}
        cfg["materials"].append(
            {
                "material_type": "MatteMaterial",
                "material_name": "mat_tex",
                "kd": "s_01",
            }
        )
        for p in cfg["Aggregate"]["primitives"]:
            p["material_name"] = "mat_tex"

    rgb, spc = _spectral_pair(mut)
    assert np.isfinite(spc).all() and spc.max() > 0
    lit = rgb.sum(-1) > 1e-3
    assert lit.sum() > 25
    ratio = spc[lit].sum() / rgb[lit].sum()
    assert 0.75 < ratio < 1.3, ratio


def test_spectral_bssrdf_render():
    """Round-3 spectral completion (final material gate): the Disney
    scatter_distance BSSRDF renders in N=60 mode — R and d are lifted via
    the Smits reflectance basis and the channel-selection / pdf machinery
    is channel-count generic (bssrdf.rs:143-145, 214-226 under the
    reference's N=60 build).  Smooth spectra: the spectral render must
    track the RGB render in aggregate energy."""

    def mut(cfg):
        cfg["Integrator"] = {"integrator_type": "Path", "max_depth": 4}
        cfg["materials"].append(
            {
                "material_type": "DisneyMaterial",
                "material_name": "mat_sss",
                "color": {"values": [0.8, 0.6, 0.4]},
                "scatter_distance": {"values": [1.0, 0.8, 0.6]},
                "roughness": 0.3,
            }
        )
        for p in cfg["Aggregate"]["primitives"]:
            p["material_name"] = "mat_sss"

    rgb, spc = _spectral_pair(mut)
    assert np.isfinite(spc).all() and spc.max() > 0
    lit = rgb.sum(-1) > 1e-3
    assert lit.sum() > 15
    ratio = spc[lit].sum() / rgb[lit].sum()
    assert 0.7 < ratio < 1.4, ratio


def test_spectral_sppm_render():
    """Round-3 spectral completion (final integrator gate): SPPM renders
    in N=60 mode — ld/tau/phi photon state carries 60 channels and the
    driver converts at the film.  Smooth spectra: aggregate energy must
    track the RGB render."""

    def mut(cfg):
        cfg["Integrator"] = {
            "integrator_type": "SPPM",
            "max_depth": 3,
            "radius": 1.0,
            "n_iters": 2,
            "photons_per_iter": 4096,
        }

    rgb, spc = _spectral_pair(mut)
    assert np.isfinite(spc).all() and spc.max() > 0
    lit = rgb.sum(-1) > 1e-3
    assert lit.sum() > 15
    ratio = spc[lit].sum() / rgb[lit].sum()
    assert 0.7 < ratio < 1.4, ratio
