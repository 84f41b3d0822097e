"""Generate the full guidance-config catalog (reference scripts/configs/**).

The YAML guidance schema is the public user interface (SURVEY.md §5); this
emits every reference config — the cond_table ablation suite (num_samples,
sampling ddim/ddpm/early-stop, latent-space, combine, weights), the single/
all/no_guidance tables, the demos, and the edit variants — in this repo's
house style (comment-free, checkpoint paths without the torch .pt suffix).

Existing files are left untouched (hand-written ones keep their comments).
Run: python scripts/gen_config_catalog.py [--force]
"""

import os
import sys

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "configs")

# -- small emitters ----------------------------------------------------------


def _fmt(v):
    if isinstance(v, bool):
        return "True" if v else "False"
    if v is None:
        return "Null"
    if isinstance(v, float):
        s = f"{v:g}"
        return s + ("." if "." not in s and "e" not in s else "")
    if isinstance(v, list):
        return "[" + ", ".join(_fmt(x) for x in v) + "]"
    if isinstance(v, str) and not v[:1].isalpha():
        return repr(v)
    return str(v)


def target_rules(rules):
    lines = ["target_rules:"]
    for name, val in rules:
        lines.append(f"  {name}: {_fmt(val)}")
    return "\n".join(lines)


CLS = {
    # rule -> (num_classes, model name, checkpoint path)
    "pitch_hist": (12, "DiTRotary-S/8-cls", "loggings/classifier/pitch/model009999"),
    "note_density": (16, "DiTRotary-S/8-cls", "loggings/classifier/nd/model009999"),
    "chord_progression": (8, "DiTRotary-S/8-chord-cls", "loggings/classifier/chord/model004999"),
    "note_density_hr_2": (16, "DiTRotary-S/8-cls", "loggings/classifier/nd_hr_2/model009999"),
    # pixel-space classifiers (abla/latent table)
    "pitch_hist_px": (12, "DiTRotary-S/8-cls", "loggings/classifier/pixel/pitch/model009999"),
    "note_density_pixel": (16, "DiTRotary-S/8-cls", "loggings/classifier/pixel/nd/model009999"),
    "chord_progression_pixel": (8, "DiTRotary-S/8-chord-cls", "loggings/classifier/pixel/chord/model004999"),
}


def cond_fn(rules, fns, scales):
    ncls = [CLS[r][0] for r in rules]
    names = [CLS[r][1] for r in rules]
    paths = [CLS[r][2] for r in rules]
    return "\n".join([
        "  cond_fn:",
        f"    rule_names: {_fmt([r.removesuffix('_px') for r in rules])}",
        f"    fns: {_fmt(fns)}",
        f"    classifier_scales: {_fmt(scales)}",
        "    classifiers:",
        f"      num_classes: {_fmt(ncls)}",
        f"      names: {_fmt(names)}",
        f"      paths: {_fmt(paths)}",
    ])


def guidance(*, vae, nn, scg=None, method="no_guidance", cond=None,
             schedule=False, t_start=750, t_end=0, interval=1,
             step_size=None, dc_base=None):
    lines = ["guidance:", f"  vae: {_fmt(vae)}", f"  nn: {_fmt(nn)}"]
    if scg is not None:
        lines.append(f"  scg: {_fmt(scg)}")
    lines.append(f"  method: {method}")
    if step_size is not None:
        lines.append(f"  step_size: {_fmt(step_size)}")
    lines.append(cond if cond is not None else "  cond_fn: Null")
    lines.append(f"  schedule: {_fmt(schedule)}")
    if schedule:
        lines += [f"  t_start: {t_start}", f"  t_end: {t_end}",
                  f"  interval: {interval}"]
    if dc_base is not None:
        lines += ["  dc:", f"    base: {dc_base}"]
    return "\n".join(lines)


def scg_block(num_samples, weights=()):
    lines = ["scg:", f"  num_samples: {num_samples}"]
    for name, w in weights:
        lines.append(f"  {name}: {_fmt(w)}")
    return "\n".join(lines)


def sampling(*, use_ddim=False, diff_collage=False, t_end=0, respacing=None):
    lines = ["sampling:", f"  use_ddim: {_fmt(use_ddim)}",
             f"  diff_collage: {_fmt(diff_collage)}", f"  t_end: {t_end}"]
    if respacing:
        lines.append(f"  timestep_respacing: {respacing}")
    return "\n".join(lines)


def dc_block(type_="circle", overlap=64, num_img=1):
    return "\n".join(["dc:", f"  type: {type_}",
                      f"  overlap_size: {overlap}", f"  num_img: {num_img}"])


def edit_block(source="dataset", noise_level=500, l_start=0, l_end=128):
    return "\n".join(["edit:", f"  source: {source}",
                      f"  noise_level: {noise_level}",
                      f"  l_start: {l_start}", f"  l_end: {l_end}"])


def doc(*blocks):
    return "\n\n".join(blocks) + "\n"


# -- the catalog --------------------------------------------------------------

ND = [("vertical_nd", None), ("horizontal_nd", None)]
PITCH = [("pitch_hist", None)]
CHORD = [("chord_progression", None)]
ALL4 = PITCH + ND + CHORD

ALL_CLS = cond_fn(
    ["pitch_hist", "note_density", "chord_progression"],
    ["grad_nn_zt_mse", "grad_nn_zt_mse", "grad_nn_zt_chord"],
    [400, 10.0, 10.0],
)
ALL_DPS = cond_fn(
    ["pitch_hist", "note_density", "chord_progression"],
    ["nn_z0_mse_dummy", "nn_z0_mse_dummy", "nn_z0_chord_dummy"],
    [40.0, 1.0, 1.0],
)
ALL_W = (("pitch_hist", 40.0), ("note_density", 1.0),
         ("chord_progression", 1.0))

FILES = {}

# demos 2/3 (demo1 is hand-written)
FILES["cond_demo/demo2.yml"] = doc(
    target_rules([
        ("pitch_hist", [0.5, 0.0, 0.0, 0.0, 0.25, 0.0, 0.0, 0.25, 0.0, 0.0, 0.0, 0.0]),
        ("vertical_nd", [3.0] * 8), ("horizontal_nd", [15.0] * 8),
    ]),
    guidance(vae=True, nn=False, scg=True, schedule=True, dc_base=128),
    scg_block(16, (("pitch_hist", 100.0), ("note_density", 1.0))),
    sampling(diff_collage=True),
    dc_block(),
)
FILES["cond_demo/demo3.yml"] = doc(
    target_rules([
        ("pitch_hist", [0.4, 0.0, 0.0, 0.4, 0.0, 0.0, 0.0, 0.2, 0.0, 0.0, 0.0, 0.0]),
        ("vertical_nd", [1.0, 1.0, 2.0, 3.0, 3.0, 2.0, 1.0, 1.0]),
        ("horizontal_nd", [15.0, 10.0, 10.0, 5.0, 5.0, 10.0, 10.0, 15.0]),
    ]),
    guidance(vae=True, nn=True, scg=True, method="classifier_guidance",
             cond=cond_fn(["pitch_hist", "note_density"],
                          ["grad_nn_zt_mse", "grad_nn_zt_mse"], [400, 10.0]),
             schedule=True),
    scg_block(16, (("pitch_hist", 40.0), ("note_density", 1.0))),
    sampling(diff_collage=True),
    dc_block(),
)

# cond_table/all
FILES["cond_table/all/classifier.yml"] = doc(
    target_rules(ALL4),
    guidance(vae=False, nn=True, scg=False, method="classifier_guidance",
             cond=ALL_CLS),
    sampling(),
)
FILES["cond_table/all/dps_nn.yml"] = doc(
    target_rules(ALL4),
    guidance(vae=False, nn=True, scg=False, method="dps", step_size=1.0,
             cond=ALL_DPS),
    sampling(),
)
FILES["cond_table/all/scg.yml"] = doc(
    target_rules(ALL4),
    guidance(vae=True, nn=False, scg=True, schedule=True),
    scg_block(16, ALL_W),
    sampling(),
)
FILES["cond_table/all/scg_dps_nn_all.yml"] = doc(
    target_rules(ALL4),
    guidance(vae=True, nn=True, scg=True, method="dps", step_size=1.0,
             cond=ALL_DPS, schedule=True),
    scg_block(16, ALL_W),
    sampling(),
)
for tag, (ph, nd_w, ch) in {
    "100_1_1": (100.0, 1.0, 1.0), "40_1_1": (40.0, 1.0, 1.0),
    "40_1_2": (40.0, 1.0, 2.0), "40_1_4": (40.0, 1.0, 4.0),
}.items():
    FILES[f"cond_table/all/weights/scg_classifier_all_bf4_{tag}.yml"] = doc(
        target_rules(ALL4),
        guidance(vae=True, nn=True, scg=True, method="classifier_guidance",
                 cond=ALL_CLS, schedule=True),
        scg_block(4, (("pitch_hist", ph), ("note_density", nd_w),
                      ("chord_progression", ch))),
        sampling(),
    )

# cond_table/single (the three hand-written scg/* and classifier/pitch,
# dps_rule/pitch files already exist)
FILES["cond_table/single/classifier/chord.yml"] = doc(
    target_rules(CHORD),
    guidance(vae=False, nn=True, scg=False, method="classifier_guidance",
             cond=cond_fn(["chord_progression"], ["grad_nn_zt_chord"], [10.0])),
    sampling(),
)
FILES["cond_table/single/classifier/nd.yml"] = doc(
    target_rules(ND),
    guidance(vae=False, nn=True, scg=False, method="classifier_guidance",
             cond=cond_fn(["note_density"], ["grad_nn_zt_mse"], [10.0])),
    sampling(),
)
for rule, rules, fn in [
    ("pitch", PITCH, ("pitch_hist", "nn_z0_mse_dummy")),
    ("nd", ND, ("note_density", "nn_z0_mse_dummy")),
    ("chord", CHORD, ("chord_progression", "nn_z0_chord_dummy")),
]:
    FILES[f"cond_table/single/dps_nn/{rule}.yml"] = doc(
        target_rules(rules),
        guidance(vae=False, nn=True, scg=False, method="dps", step_size=1.0,
                 cond=cond_fn([fn[0]], [fn[1]], [1.0])),
        sampling(),
    )
FILES["cond_table/single/dps_rule/nd.yml"] = doc(
    target_rules(ND),
    guidance(vae=True, nn=False, scg=False, method="dps", step_size=1.0,
             cond="\n".join([
                 "  cond_fn:",
                 "    rule_names: ['note_density']",
                 "    fns: ['rule_x0_mse_dummy']",
                 "    classifier_scales: [1.]",
             ])),
    sampling(),
)

# cond_table/abla/num_samples
for k in (4, 8):
    FILES[f"cond_table/abla/num_samples/nd_scg_num{k}.yml"] = doc(
        target_rules(ND),
        guidance(vae=True, nn=False, scg=True, schedule=True),
        scg_block(k),
        sampling(),
    )

# cond_table/abla/combine (SCG + nd classifier at k=4/8/16)
for k in (4, 8, 16):
    FILES[f"cond_table/abla/combine/nd_scg_cls_num{k}.yml"] = doc(
        target_rules(ND),
        guidance(vae=True, nn=True, scg=True, method="classifier_guidance",
                 cond=cond_fn(["note_density"], ["grad_nn_zt_mse"], [10.0]),
                 schedule=True),
        scg_block(k),
        sampling(),
    )

# cond_table/abla/sampling
for n in (25, 50, 100):
    FILES[f"cond_table/abla/sampling/ddim/ddim{n}.yml"] = doc(
        target_rules(ND),
        guidance(vae=True, nn=False, scg=True),
        scg_block(16),
        sampling(use_ddim=True, respacing=f"ddim{n}"),
    )
for name, kw in {
    "every2.yml": dict(interval=2), "every5.yml": dict(interval=5),
    "s400_0.yml": dict(t_start=400), "s750_400.yml": dict(t_end=400),
}.items():
    FILES[f"cond_table/abla/sampling/ddpm/{name}"] = doc(
        target_rules(ND),
        guidance(vae=True, nn=False, scg=True, schedule=True, **kw),
        scg_block(16),
        sampling(),
    )
for es in (200, 300, 400):
    FILES[f"cond_table/abla/sampling/ddpmes/s750_{es}.yml"] = doc(
        target_rules(ND),
        guidance(vae=True, nn=False, scg=True, schedule=True),
        scg_block(16),
        sampling(t_end=es),
    )

# cond_table/abla/latent (pixel-space variants; guidance.vae False)
_PX = {"pitch": ("pitch_hist_px", PITCH),
       "nd": ("note_density_pixel", ND),
       "chord": ("chord_progression_pixel",
                 [("chord_progression_pixel", None)])}
for rule, (clsr, rules) in _PX.items():
    # upstream's latent no_guidance targets name the plain (non-pixel) rules
    FILES[f"cond_table/abla/latent/no_guidance/{rule}.yml"] = doc(
        target_rules({"pitch": PITCH, "nd": ND, "chord": CHORD}[rule]),
        guidance(vae=False, nn=False, scg=False),
        sampling(),
    )
    FILES[f"cond_table/abla/latent/scg/{rule}.yml"] = doc(
        target_rules(rules),
        guidance(vae=False, nn=False, scg=True, schedule=True),
        scg_block(16),
        sampling(),
    )
    FILES[f"cond_table/abla/latent/classifier/{rule}.yml"] = doc(
        target_rules(rules),
        guidance(vae=False, nn=True, scg=False, method="classifier_guidance",
                 cond=cond_fn([clsr],
                              ["grad_nn_zt_chord" if rule == "chord"
                               else "grad_nn_zt_mse"],
                              [400.0 if rule == "pitch" else 10.0])),
        sampling(),
    )
for rule, (clsr, rules) in _PX.items():
    for suffix, step in [("", 1.0), ("_step_0_1", 0.1)]:
        if rule == "chord" and suffix:
            continue  # upstream ships no chord _step variant
        FILES[f"cond_table/abla/latent/dps_nn/{rule}{suffix}.yml"] = doc(
            target_rules(rules),
            guidance(vae=False, nn=True, scg=False, method="dps",
                     step_size=step,
                     cond=cond_fn([clsr],
                                  ["nn_z0_chord_dummy" if rule == "chord"
                                   else "nn_z0_mse_dummy"], [1.0])),
            sampling(),
        )
for rule, rules, rname in [("pitch", PITCH, "pitch_hist"),
                           ("nd", ND, "note_density")]:
    for suffix, step in [("", 1.0), ("_step_0_1", 0.1)]:
        if rule == "nd" and suffix:
            continue  # upstream ships only pitch_step_0_1 for dps_rule
        FILES[f"cond_table/abla/latent/dps_rule/{rule}{suffix}.yml"] = doc(
            target_rules(rules),
            guidance(vae=True, nn=False, scg=False, method="dps",
                     step_size=step,
                     cond="\n".join([
                         "  cond_fn:",
                         f"    rule_names: ['{rname}']",
                         "    fns: ['rule_x0_mse_dummy']",
                         "    classifier_scales: [1.]",
                     ])),
            sampling(),
        )

# edit variants (nd_500_num16 is hand-written)
FILES["edit/chord.yml"] = doc(
    target_rules(CHORD),
    guidance(vae=True, nn=False, scg=True, schedule=True),
    scg_block(16),
    sampling(),
    edit_block(),
)
FILES["edit/nd_600_num16.yml"] = doc(
    target_rules([("vertical_nd_hr_2", None), ("horizontal_nd_hr_2", None)]),
    guidance(vae=True, nn=True, scg=True, method="classifier_guidance",
             cond=cond_fn(["note_density_hr_2"], ["grad_nn_zt_mse"], [10.0]),
             schedule=True),
    scg_block(16),
    sampling(),
    edit_block(noise_level=600),
)
FILES["edit/nd_scg_given_target.yml"] = doc(
    target_rules([("vertical_nd", [3.0, 3.0]),
                  ("horizontal_nd", [10.0, 10.0])]),
    guidance(vae=True, nn=False, scg=True, schedule=True),
    scg_block(4),
    sampling(),
    edit_block(l_start=32, l_end=64),
)


def main():
    force = "--force" in sys.argv
    written = skipped = 0
    for rel, content in sorted(FILES.items()):
        path = os.path.join(ROOT, rel)
        if os.path.exists(path) and not force:
            skipped += 1
            continue
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            f.write(content)
        written += 1
    print(f"wrote {written} configs under {ROOT} ({skipped} existing kept)")


if __name__ == "__main__":
    main()
