"""Every registered parameter is consumed somewhere or explicitly
tagged (config/unwired.py) — a registered flag that silently does
nothing is worse than an absent one (the reference's settings all
drive behavior or the GUI)."""
import json
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

GUI_PREFIXES = ("gui_", "web_")
GUI_EXTRA = {"panic_button", "heatmap_dynamic", "heatmap_ids",
             "heatmap_smooth", "heatmap_value_range",
             "solid_background_color", "individual_names",
             "manually_approved"}
META_PREFIXES = ("app_", "build_", "meta_")
META_EXTRA = {"version", "cmd_line", "wd", "exec", "video_info",
              "test_image", "recording", "terminate"}


def _source_blob() -> str:
    src = []
    for p in (REPO / "trex_tpu").rglob("*.py"):
        if p.name == "unwired.py":
            continue  # the tag registry itself must not count
        src.append(p.read_text())
    for extra in ("bench.py", "__graft_entry__.py"):
        src.append((REPO / extra).read_text())
    for p in (REPO / "tools").glob("*.py"):
        src.append(p.read_text())
    return "\n".join(src)


def test_every_registered_param_consumed_or_tagged():
    from trex_tpu.config.unwired import UNWIRED

    doc = json.loads(
        (REPO / "trex_tpu/config/params_table.json").read_text())
    src = _source_blob()
    missing = []
    for p in doc["parameters"]:
        name = p["name"]
        if f'"{name}"' in src or f"'{name}'" in src:
            continue
        if name.startswith(GUI_PREFIXES) or name in GUI_EXTRA:
            continue  # GUI scope: headless build has no consumer
        if name.startswith(META_PREFIXES) or name in META_EXTRA:
            continue  # app/build metadata: informational only
        if name in UNWIRED:
            continue  # explicitly tagged, honest gap
        missing.append(name)
    assert not missing, (
        "registered parameters neither consumed nor tagged in "
        f"config/unwired.py: {missing}")


def test_unwired_tags_stay_honest():
    """A tag must be REMOVED once code consumes the parameter (stale
    tags hide that the registry drifted)."""
    from trex_tpu.config.unwired import UNWIRED

    src = _source_blob()
    stale = [n for n in UNWIRED
             if f'"{n}"' in src or f"'{n}'" in src]
    assert not stale, f"tagged as unwired but consumed in code: {stale}"
