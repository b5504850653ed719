"""Render configuration: the reference's ~40 global flags as one dataclass.

Mirrors the globals declared in reference render.h:27-110 with defaults from
photonmap.cpp:40-106 and the flag parser io_utils.cpp:16-212 (including its
quirks: `-md` is Monte-Carlo depth, `-pd` is photon depth, `-ss` is the
*extra shadow test count*, `-fast_global` force-enables photon visualization
and disables indirect).

All fields are static (Python) values: they select which passes are traced
into the jitted wavefront program and with what static sample dimensions.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

DISK, CONE, GAUSS = 0, 1, 2
_FILTER_NAMES = {"disk": DISK, "cone": CONE, "gauss": GAUSS}


@dataclass(frozen=True)
class RenderConfig:
    # Misc (io_utils.cpp:24-42)
    verbose: bool = False
    threads: int = 0                  # device-mesh size cap; 0 = all local devices
                                      # (reference thread count, io_utils.cpp:26-29)
    fresnel: bool = True
    ir_air: float = 1.0

    # Render equation toggles (photonmap.cpp:50-55)
    ambient: bool = True
    direct_illum: bool = True
    transmissive_illum: bool = True
    specular_illum: bool = True
    indirect_illum: bool = True
    caustic_illum: bool = True

    # Photon visualization modes (photonmap.cpp:58-64)
    direct_photon_illum: bool = False  # -photon_viz
    fast_global: bool = False
    irradiance_cache: bool = False

    # Shadows (photonmap.cpp:67-72)
    shadows: bool = True
    soft_shadows: bool = True
    light_test: int = 128             # direct illumination samples per 2D light
    shadow_test: int = 128            # *additional* shadow-only samples per light

    # Monte Carlo path tracing (photonmap.cpp:75-82)
    monte_carlo: bool = True
    max_monte_depth: int = 128
    prob_absorb: float = 0.005
    recursive_shadows: bool = True
    distrib_transmissive: bool = True
    transmissive_test: int = 128
    distrib_specular: bool = True
    specular_test: int = 128

    # Depth of field (photonmap.cpp:85-88)
    depth_of_field: bool = False
    dof_test: int = 1
    focus_depth: float = 100.0
    aperture_radius: float = 0.025

    # Photon map tracing (photonmap.cpp:91-93)
    global_photon_count: int = 2176
    caustic_photon_count: int = 10_000_000
    max_photon_depth: int = 128

    # Photon map sampling (photonmap.cpp:96-106)
    indirect_test: int = 256
    global_estimate_size: int = 50
    global_estimate_dist: float = 2.5
    global_filter: int = DISK
    caustic_estimate_size: int = 225
    caustic_estimate_dist: float = 0.225
    caustic_filter: int = DISK
    filter_const_a: float = 0.918
    filter_const_b: float = 1.953
    filter_const_k: float = 1.0

    # Image (photonmap.cpp:27-34)
    width: int = 1024
    height: int = 1024
    aa: int = 2                       # supersample 2^aa per axis, box-downsample
    real_material: bool = False       # -real: energy-normalize kd+ks+kt at load

    # TPU-native additions (no reference equivalent)
    ray_tile: int = 16384             # eye rays per wavefront launch
    seed: int = 0
    use_pallas: str = "auto"          # "auto" | "always" | "never"
    differentiable: bool = False      # fixed-trip scan walk (reverse-mode AD)
    diff_monte_depth: int = 32        # walk-depth cap in differentiable mode
                                      # (the scan pays every masked trip;
                                      # RR kills ~all lanes far earlier)
    vis_softness: float = 0.0         # >0 + differentiable: smooth shadow
                                      # visibility (ops.intersect.soft_visibility)
    save_maps: str | None = None      # checkpoint photon maps after build
    load_maps: str | None = None      # restore photon maps (skip tracing)
    trace_dir: str | None = None      # jax.profiler trace output directory
    shard_maps: bool = False          # keep photon maps device-sharded and
                                      # gather by ring exchange (P8) even for
                                      # small maps
    shard_maps_threshold: int = 10_000_000  # auto-shard maps above this many
                                      # stored photons (replication is cheap
                                      # below ~10M at 20 B/photon)
    gather_cell_max: int = 16384      # Pallas gather: photons streamed per
                                      # grid cell before flux-rescaled
                                      # truncation bounds dense-cell work
                                      # (0 = unlimited/exact; within-cell
                                      # order is decorrelated at build so
                                      # the visible prefix is an unbiased
                                      # sample)

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)


def parse_args(argv: list[str]) -> tuple[str, str | None, RenderConfig]:
    """Parse the reference CLI surface (io_utils.cpp:16-212).

    Returns (input_scene, output_image, config).  Mirrors the reference's
    clamping rules and quirky duplicate branches.
    """
    cfg: dict = {}
    scene_name: str | None = None
    image_name: str | None = None

    def geti(it) -> int:
        return int(next(it))

    def getf(it) -> float:
        return float(next(it))

    it = iter(argv)
    for arg in it:
        if not arg.startswith("-"):
            if scene_name is None:
                scene_name = arg
            elif image_name is None:
                image_name = arg
            else:
                raise SystemExit(f"Invalid program argument: {arg}")
            continue
        if arg == "-v":
            cfg["verbose"] = True
        elif arg == "-threads":
            cfg["threads"] = max(1, geti(it))
        elif arg == "-aa":
            cfg["aa"] = abs(geti(it))
        elif arg == "-real":
            cfg["real_material"] = True
        elif arg == "-no_fresnel":
            cfg["fresnel"] = False
        elif arg == "-ir":
            v = getf(it)
            cfg["ir_air"] = v if v > 0 else 1e-6
        elif arg == "-no_ambient":
            cfg["ambient"] = False
        elif arg == "-no_direct":
            cfg["direct_illum"] = False
        elif arg == "-no_transmissive":
            cfg["transmissive_illum"] = False
        elif arg == "-no_specular":
            cfg["specular_illum"] = False
        elif arg == "-no_indirect":
            cfg["indirect_illum"] = False
        elif arg == "-no_caustic":
            cfg["caustic_illum"] = False
        elif arg == "-photon_viz":
            cfg["direct_photon_illum"] = True
        elif arg == "-fast_global":
            # io_utils.cpp:58-61 — force-enables photon viz, disables indirect
            cfg["fast_global"] = True
            cfg["direct_photon_illum"] = True
            cfg["indirect_illum"] = False
        elif arg == "-cache":
            cfg["irradiance_cache"] = True
        elif arg == "-no_monte":
            cfg["monte_carlo"] = False
        elif arg == "-md":
            cfg["max_monte_depth"] = max(1, geti(it))
        elif arg == "-absorb":
            cfg["prob_absorb"] = max(0.0, getf(it))
        elif arg == "-no_rs":
            cfg["recursive_shadows"] = False
        elif arg == "-no_dt":
            cfg["distrib_transmissive"] = False
        elif arg == "-tt":
            cfg["transmissive_test"] = max(1, geti(it))
        elif arg == "-no_ds":
            cfg["distrib_specular"] = False
        elif arg == "-st":
            cfg["specular_test"] = max(1, geti(it))
        elif arg == "-global":
            cfg["global_photon_count"] = max(1, geti(it))
        elif arg == "-caustic":
            cfg["caustic_photon_count"] = max(1, geti(it))
        elif arg == "-pd":
            cfg["max_photon_depth"] = max(1, geti(it))
        elif arg == "-it":
            cfg["indirect_test"] = max(1, geti(it))
        elif arg == "-gs":
            cfg["global_estimate_size"] = max(1, geti(it))
        elif arg == "-gd":
            v = getf(it)
            cfg["global_estimate_dist"] = v if v >= 0 else 1e-6
        elif arg == "-gf":
            name = next(it)
            if name == "cone":
                cfg["global_filter"] = CONE
                cfg["filter_const_k"] = max(1.0, getf(it))
            elif name == "gauss":
                cfg["global_filter"] = GAUSS
        elif arg == "-cs":
            cfg["caustic_estimate_size"] = max(1, geti(it))
        elif arg == "-cd":
            v = getf(it)
            cfg["caustic_estimate_dist"] = v if v >= 0 else 1e-6
        elif arg == "-cf":
            name = next(it)
            if name == "cone":
                cfg["caustic_filter"] = CONE
                cfg["filter_const_k"] = max(1.0, getf(it))
            elif name == "gauss":
                cfg["caustic_filter"] = GAUSS
        elif arg == "-no_shadow":
            cfg["shadows"] = False
        elif arg == "-no_ss":
            cfg["soft_shadows"] = False
        elif arg == "-lt":
            cfg["light_test"] = max(1, geti(it))
        elif arg == "-ss":
            cfg["shadow_test"] = max(0, geti(it))
        elif arg == "-dof":
            cfg["depth_of_field"] = True
            cfg["dof_test"] = max(1, geti(it))
            cfg["focus_depth"] = max(1e-6, getf(it))
            cfg["aperture_radius"] = max(1e-6, getf(it))
        elif arg == "-resolution":
            cfg["width"] = abs(geti(it))
            cfg["height"] = abs(geti(it))
        # TPU-native extensions
        elif arg == "-seed":
            cfg["seed"] = geti(it)
        elif arg == "-tile":
            cfg["ray_tile"] = max(256, geti(it))
        elif arg == "-pallas":
            v = next(it)
            if v not in ("auto", "always", "never", "interpret"):
                raise SystemExit(f"Invalid -pallas mode: {v}")
            cfg["use_pallas"] = v
        elif arg == "-soft_vis":
            cfg["differentiable"] = True
            cfg["vis_softness"] = max(0.0, getf(it))
        elif arg == "-save_maps":
            cfg["save_maps"] = next(it)
        elif arg == "-load_maps":
            cfg["load_maps"] = next(it)
        elif arg == "-trace":
            cfg["trace_dir"] = next(it)
        elif arg == "-shard_maps":
            cfg["shard_maps"] = True
        else:
            raise SystemExit(f"Invalid program argument: {arg}")

    if scene_name is None or image_name is None:
        raise SystemExit("Usage: photonmap inputscenefile outputimagefile [-FLAGS]")
    return scene_name, image_name, RenderConfig(**cfg)
