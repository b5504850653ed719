"""Scene-sweep driver: render every bundled `.scn` scene and build a
contact sheet — the framework's analogue of the reference's per-scene make
targets + curated gallery (Makefile:52-233, gallery/tests/): the reference
has no automated tests, its de-facto regression suite is "render all the
scenes and look at them" (SURVEY.md §4).

Each scene renders with a scaled-down version of the Makefile's active
CFLAGS (Makefile:12: aa 1, lt 128, ss 96, tt/st 512, md 128, it 960,
cone filter, 1M global photons) so every layer the flags enable gets
exercised, and the sweep asserts every image is finite with nonzero
coverage.  Outputs:

    <out>/<scene>.png        one render per scene
    <out>/contact_sheet.png  tiled thumbnails, labeled
    <out>/sweep.json         per-scene wall-clock + stats (machine-readable)

Usage:
    python tools/scene_sweep.py [--res 64] [--out /tmp/gi_sweep]
        [--input /root/reference/input] [--scenes a.scn b.scn ...]
        [--cpu]                # force CPU (default: whatever jax picks)
"""

import argparse
import json
import os
import sys
import time
import traceback

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def parse_args(argv):
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--out", default="/tmp/gi_sweep")
    ap.add_argument("--input", default="/root/reference/input")
    ap.add_argument("--scenes", nargs="*", default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--timeout", type=float, default=600.0,
                    help="skip remaining scenes when total wall exceeds")
    ap.add_argument("--resume", action="store_true",
                    help="skip scenes whose PNG already exists in --out")
    return ap.parse_args(argv)


def sweep_config(res):
    """The Makefile CFLAGS scaled to sweep size: same layers ON, fewer
    samples/photons (a 64^2 regression render, not a 1024^2 final)."""
    from gi_tpu.utils.config import RenderConfig
    return RenderConfig(
        width=res, height=res, aa=0,
        light_test=8, shadow_test=6,             # -lt 128 -ss 96
        transmissive_test=16, specular_test=16,  # -tt/-st 512
        max_monte_depth=16,                      # -md 128
        indirect_test=8,                         # -it 960
        caustic_filter=1, filter_const_k=1.0,    # -cf cone 1.0
        global_photon_count=20000,               # -global 1000000
        global_estimate_size=50,                 # -gs 200
        global_estimate_dist=0.75,               # -gd .75
        caustic_photon_count=20000,
        max_photon_depth=16,
    )


def render_one(path, cfg):
    import jax
    import numpy as np
    from gi_tpu.photon.trace import build_photon_maps
    from gi_tpu.models.render import render_image
    from gi_tpu.scene.scn import load_scene
    from gi_tpu.utils.stats import RenderStats

    scene = load_scene(path)
    key = jax.random.PRNGKey(cfg.seed)
    maps, cfg = build_photon_maps(scene, cfg, key)
    stats = RenderStats()
    img = render_image(scene, cfg, photon_maps=maps, stats=stats)
    img = np.asarray(img)
    return img, {
        "finite": bool(np.isfinite(img).all()),
        "mean": float(img.mean()),
        "nonzero_frac": float((img.sum(-1) > 0).mean()),
        "total_rays": int(sum(stats.counts[:7])),
    }


def contact_sheet(results, out_path, res):
    """Tile the renders into one labeled sheet (PIL, no GL — the
    headless stand-in for the reference's gallery browsing)."""
    from PIL import Image, ImageDraw
    import numpy as np

    names = sorted(results)
    cols = 7
    rows = -(-len(names) // cols)
    label_h = 12
    cell = (res, res + label_h)
    sheet = Image.new("RGB", (cols * cell[0], rows * cell[1]), (24, 24, 24))
    draw = ImageDraw.Draw(sheet)
    for i, name in enumerate(names):
        r, c = divmod(i, cols)
        x, y = c * cell[0], r * cell[1]
        img = results[name].get("img")
        if img is not None:
            arr = (np.clip(img, 0, 1)[::-1] * 255).astype(np.uint8)
            sheet.paste(Image.fromarray(arr), (x, y + label_h))
            color = (180, 255, 180)
        else:
            color = (255, 120, 120)
        draw.text((x + 2, y + 1), name[:20], fill=color)
    sheet.save(out_path)


def main(argv=None):
    args = parse_args(argv)
    if args.cpu:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    if args.cpu:
        try:
            jax.config.update("jax_default_device", jax.devices("cpu")[0])
        except RuntimeError:
            pass

    os.makedirs(args.out, exist_ok=True)
    scenes = args.scenes or sorted(
        f for f in os.listdir(args.input) if f.endswith(".scn"))
    cfg = sweep_config(args.res)

    t_start = time.time()
    results = {}
    record = {}
    for name in scenes:
        png = os.path.join(args.out, name[:-4] + ".png")
        if args.resume and os.path.exists(png):
            from gi_tpu.utils.image import read_image
            img = read_image(png)[::-1]  # back to row-0-bottom
            results[name] = {"img": img}
            record[name] = {"ok": True, "resumed": True,
                            "mean": float(img.mean()),
                            "nonzero_frac": float((img.sum(-1) > 0).mean()),
                            "finite": bool(np.isfinite(img).all())}
            continue
        if time.time() - t_start > args.timeout:
            record[name] = {"skipped": "sweep timeout"}
            results[name] = {}
            print(f"[sweep] {name}: skipped (timeout)", flush=True)
            continue
        t0 = time.time()
        try:
            img, info = render_one(os.path.join(args.input, name), cfg)
            info["seconds"] = round(time.time() - t0, 1)
            ok = info["finite"] and info["nonzero_frac"] > 0.005
            info["ok"] = ok
            results[name] = {"img": img}
            record[name] = info
            from gi_tpu.utils.image import write_image
            write_image(img, os.path.join(args.out, name[:-4] + ".png"))
            print(f"[sweep] {name}: {'ok' if ok else 'SUSPECT'} "
                  f"mean={info['mean']:.4f} nz={info['nonzero_frac']:.2f} "
                  f"({info['seconds']}s)", flush=True)
        except Exception as e:  # noqa: BLE001 — record per-scene failures
            record[name] = {"ok": False, "error": repr(e),
                            "seconds": round(time.time() - t0, 1)}
            results[name] = {}
            print(f"[sweep] {name}: FAILED {e!r}", flush=True)
            traceback.print_exc()

    contact_sheet(results, os.path.join(args.out, "contact_sheet.png"),
                  args.res)
    with open(os.path.join(args.out, "sweep.json"), "w") as f:
        json.dump(record, f, indent=1)
    n_ok = sum(1 for r in record.values() if r.get("ok"))
    print(f"[sweep] {n_ok}/{len(scenes)} ok -> {args.out}", flush=True)
    return 0 if n_ok == sum(1 for r in record.values()
                            if "skipped" not in r) else 1


if __name__ == "__main__":
    sys.exit(main())
