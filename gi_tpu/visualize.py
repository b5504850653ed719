"""`python -m gi_tpu.visualize scene.scn out_prefix [-FLAGS]` — headless
counterpart of the reference's `visualize` binary (visualize.cpp:1899, GLUT
main loop with key toggles :1660-1737). Every interactive toggle is a flag:

  -photons            build + draw global/caustic photon clouds (keys C/G)
  -global N -caustic N  photon counts for the clouds
  -paths N            draw N Monte Carlo eye paths (key M / DrawPaths)
  -emitted N          draw N emitted photon vectors (key T / DrawEmitted)
  -fan                importance-sample fan at the center pixel (key R)
  -views e,a;e,a      view angles (elev,azim pairs; default 3 standard views)
  -seed N
"""

from __future__ import annotations

import sys

import jax


def main(argv=None):
    from .photon.trace import build_photon_maps
    from .scene.scn import load_scene
    from .utils.config import RenderConfig
    from .viz import visualize

    args = sys.argv[1:] if argv is None else argv
    pos, flags = [], {}
    it = iter(args)
    for a in it:
        if not a.startswith("-"):
            pos.append(a)
        elif a in ("-photons", "-fan"):
            flags[a] = True
        elif a in ("-paths", "-emitted", "-seed", "-global", "-caustic"):
            flags[a] = int(next(it))
        elif a == "-views":
            flags[a] = next(it)
        else:
            raise SystemExit(f"Invalid program argument: {a}")
    if len(pos) != 2:
        raise SystemExit(
            "Usage: python -m gi_tpu.visualize scene out_prefix [-FLAGS]")
    scene_name, out_prefix = pos

    scene = load_scene(scene_name)
    cfg = RenderConfig(
        width=256, height=256, aa=0,
        global_photon_count=flags.get("-global", 20000),
        caustic_photon_count=flags.get("-caustic", 20000),
        seed=flags.get("-seed", 0))

    maps = None
    if flags.get("-photons"):
        maps, cfg = build_photon_maps(
            scene, cfg.replace(indirect_illum=True, caustic_illum=True),
            jax.random.PRNGKey(cfg.seed))

    views = ((30, -60), (90, -90), (0, -90))
    if "-views" in flags:
        views = tuple(tuple(int(x) for x in pair.split(","))
                      for pair in flags["-views"].split(";"))

    written = visualize(
        scene, cfg, out_prefix, photon_maps=maps,
        show_paths=flags.get("-paths", 0),
        show_emitted=flags.get("-emitted", 0),
        show_fan=flags.get("-fan", False),
        seed=flags.get("-seed", 0), views=views)
    for w in written:
        print(f"Wrote {w}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
