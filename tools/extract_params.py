#!/usr/bin/env python3
"""Extract the public parameter table (names, defaults, docs, access levels)
from the reference's CONFIG(...) registries into a JSON data table.

This captures the *API surface* of the reference (parameter names/types/
defaults are user-facing contract; see reference
Application/src/tracker/core/default_config.cpp and
Application/src/grabber/misc/default_config.cpp). The implementation of the
settings system itself is written fresh in trex_tpu/config/.
"""
import json
import re
import sys

ACCESS_LEVELS = {"PUBLIC", "STARTUP", "INIT", "LOAD", "SYSTEM"}


def split_top_level(s):
    """Split a C++ argument list on top-level commas."""
    parts, depth, cur, i = [], 0, [], 0
    in_str = False
    while i < len(s):
        c = s[i]
        if in_str:
            cur.append(c)
            if c == "\\":
                if i + 1 < len(s):
                    cur.append(s[i + 1])
                    i += 1
            elif c == '"':
                in_str = False
        else:
            if c == '"':
                in_str = True
                cur.append(c)
            elif c in "([{<" and not (c == "<" and depth == 0 and False):
                # treat <> as nesting only when part of template-ish context;
                # simple heuristic: always nest for ([{, nest <> only if it
                # looks like template args (preceded by identifier char)
                if c == "<":
                    prev = cur[-1] if cur else (parts[-1][-1] if parts else "")
                    if not (prev.isalnum() or prev == "_" or prev == ":"):
                        cur.append(c)
                        i += 1
                        continue
                depth += 1
                cur.append(c)
            elif c in ")]}>":
                if c == ">" and depth == 0:
                    cur.append(c)
                    i += 1
                    continue
                depth -= 1 if depth > 0 else 0
                cur.append(c)
            elif c == "," and depth == 0:
                parts.append("".join(cur).strip())
                cur = []
            else:
                cur.append(c)
        i += 1
    if cur:
        parts.append("".join(cur).strip())
    return parts


def find_config_calls(text, macro="CONFIG"):
    out = []
    for m in re.finditer(r"\b" + macro + r"\s*\(", text):
        start = m.end()
        depth = 1
        i = start
        in_str = False
        while i < len(text) and depth:
            c = text[i]
            if in_str:
                if c == "\\":
                    i += 1
                elif c == '"':
                    in_str = False
            else:
                if c == '"':
                    in_str = True
                elif c == "(":
                    depth += 1
                elif c == ")":
                    depth -= 1
            i += 1
        out.append(text[start : i - 1])
    return out


def parse_cpp_string(s):
    """Concatenate adjacent C++ string literals into one python string."""
    res = []
    i = 0
    while i < len(s):
        if s[i] == '"':
            i += 1
            while i < len(s) and s[i] != '"':
                if s[i] == "\\" and i + 1 < len(s):
                    esc = s[i + 1]
                    res.append({"n": "\n", "t": "\t", '"': '"', "\\": "\\"}.get(esc, esc))
                    i += 2
                    continue
                res.append(s[i])
                i += 1
            i += 1
        else:
            i += 1
    return "".join(res)


NUM_RE = re.compile(r"^-?(\d+\.?\d*|\.\d+)(e-?\d+)?f?$")
INT_CAST = re.compile(
    r"^(?:\(?(?:uint64_t|uint32_t|uint16_t|uint8_t|int64_t|int32_t|int|uchar|uint|long_t|size_t|Frame_t)\)?)\s*\(?\s*(-?\d+)u?\s*\)?$"
)
FLOAT_CAST = re.compile(r"^(?:float|double|Float2<[^>]*>)\s*\(\s*(-?[\d.]+)f?\s*\)$")


def infer_default(expr):
    """Best-effort (type, json_default) from a C++ default expression."""
    e = expr.strip()
    if e in ("true", "false"):
        return "bool", e == "true"
    if NUM_RE.match(e):
        if "." in e or "e" in e or e.endswith("f"):
            return "float", float(e.rstrip("f"))
        return "int", int(e)
    m = INT_CAST.match(e)
    if m:
        return "int", int(m.group(1))
    m = FLOAT_CAST.match(e)
    if m:
        return "float", float(m.group(1))
    if e.startswith("std::string"):
        return "str", parse_cpp_string(e)
    if e.startswith('"'):
        return "str", parse_cpp_string(e)
    if e.startswith("file::Path"):
        return "path", parse_cpp_string(e)
    if e.startswith("file::PathArray"):
        return "path_array", parse_cpp_string(e)
    m = re.match(r"^[A-Za-z_][\w:]*_t::(\w+)$", e)
    if m:
        return "enum:" + e.split("::")[0], m.group(1)
    if e.startswith("std::vector") or e.startswith("std::set"):
        inner = e[e.index("{") + 1 : e.rindex("}")] if "{" in e else ""
        items = [x for x in split_top_level(inner) if x]
        vals = []
        for it in items:
            t, v = infer_default(it)
            vals.append(v if t != "raw" else it)
        return "list", vals
    m = re.match(r"^(Size2|Vec2)\s*\(([^)]*)\)$", e)
    if m:
        nums = [float(x.strip().rstrip("f")) for x in m.group(2).split(",") if x.strip()] or [0.0]
        if len(nums) == 1:
            nums = nums * 2
        return "vec2", nums
    m = re.match(r"^Range[f]?\s*(?:<[^>]*>)?\s*\(([^)]*)\)$", e)
    if m:
        nums = [x.strip().rstrip("f") for x in m.group(1).split(",")]
        try:
            return "range", [float(n) for n in nums]
        except ValueError:
            return "raw", e
    return "raw", e


def extract(path, macro="CONFIG"):
    text = open(path).read()
    rows = []
    for call in find_config_calls(text, macro):
        args = split_top_level(call)
        if len(args) < 3 or not args[0].startswith('"'):
            continue
        name = parse_cpp_string(args[0])
        default_expr = args[1]
        doc = parse_cpp_string(args[2])
        access = "PUBLIC"
        for a in args[3:]:
            a = a.strip()
            if a in ACCESS_LEVELS:
                access = a
        typ, default = infer_default(default_expr)
        rows.append(
            {
                "name": name,
                "type": typ,
                "default": default,
                "default_cpp": default_expr,
                "doc": doc,
                "access": access,
            }
        )
    return rows


def extract_deprecations(path):
    """Parse the deprecated-name map from default_config.cpp."""
    text = open(path).read()
    m = re.search(r"Deprecations\s*\(\s*\{(.*?)\}\s*\)\s*;", text, re.S)
    deps = {}
    if m:
        for dm in re.finditer(r'\{\s*"([^"]+)"\s*,\s*"([^"]*)"', m.group(1)):
            deps[dm.group(1)] = dm.group(2) or None
    return deps


# Hand-resolved defaults for expressions the heuristic can't parse
# (defaults defined via local variables or complex C++ types in the
# reference default_config.cpp).
FIXUPS = {
    "output_fields": ("list", [
        ["X", ["RAW", "WCENTROID"]], ["Y", ["RAW", "WCENTROID"]],
        ["X", ["RAW", "HEAD"]], ["Y", ["RAW", "HEAD"]],
        ["VX", ["RAW", "HEAD"]], ["VY", ["RAW", "HEAD"]],
        ["AX", ["RAW", "HEAD"]], ["AY", ["RAW", "HEAD"]],
        ["ANGLE", ["RAW"]], ["ANGULAR_V", ["RAW"]], ["ANGULAR_A", ["RAW"]],
        ["MIDLINE_OFFSET", ["RAW"]], ["normalized_midline", ["RAW"]],
        ["midline_length", ["RAW"]], ["midline_x", ["RAW"]],
        ["midline_y", ["RAW"]], ["midline_segment_length", ["RAW"]],
        ["SPEED", ["RAW", "WCENTROID"]], ["SPEED", ["RAW", "PCENTROID"]],
        ["SPEED", ["RAW", "HEAD"]], ["BORDER_DISTANCE", ["PCENTROID"]],
        ["time", []], ["timestamp", []], ["frame", []], ["missing", []],
        ["num_pixels", []],
        ["ACCELERATION", ["RAW", "PCENTROID"]],
        ["ACCELERATION", ["RAW", "WCENTROID"]],
        ["visual_identification_p", ["RAW"]],
    ]),
    "output_annotations": ("dict", {
        "X": "cm", "Y": "cm", "VX": "cm/s", "VY": "cm/s",
        "SPEED": "cm/s", "SPEED_SMOOTH": "cm/s", "SPEED_OLD": "cm/s",
        "ACCELERATION": "cm/s2", "ACCELERATION_SMOOTH": "cm/s2",
        "ORIENTATION": "rad", "BORDER_DISTANCE": "cm",
        "NEIGHBOR_DISTANCE": "cm", "global": "px",
    }),
    "output_default_options": ("dict", {
        "NEIGHBOR_DISTANCE": ["/10"], "DOT_V": ["/10"], "L_V": ["/10"],
        "v_direction": ["/10"], "event_acceleration": ["/15"],
        "SPEED": ["/10"], "NEIGHBOR_VECTOR_T": ["/1"], "X": ["/100"],
        "Y": ["/100"], "tailbeat_threshold": ["pm"], "tailbeat_peak": ["pm"],
        "threshold_reached": ["POINTS"], "midline_length": ["/15"],
        "amplitude": ["/100"], "outline_size": ["/100"],
        "global": ["/10"],
    }),
    "gui_recording_format": ("enum:gui_recording_format_t", "mp4"),
    "cm_per_pixel": ("float", 0.0),
    "meta_real_width": ("float", 0.0),
    "gui_interface_scale": ("float", 1.0),
    "detect_conf_threshold": ("float", 0.1),
    "detect_tile_merge_containment": ("float", 0.5),
    "detect_tile_merge_iou": ("float", 0.55),
    "accumulation_tracklet_add_factor": ("float", 1.5),
    "detect_size_filter": ("size_filters", []),
    "track_size_filter": ("size_filters", []),
    "crop_offsets": ("vec4", [0.0, 0.0, 0.0, 0.0]),
    "cam_matrix": ("list", [1, 0, 0, 0, 1, 0, 0, 0, 1]),
    "cam_undistort_vector": ("list", [0, 0, 0, 0, 0]),
    "gui_background_color": ("color", [0, 0, 0, 255]),
    "gui_single_identity_color": ("color", [0, 0, 0, 0]),
    "detect_type": ("enum:ObjectDetectionType_t", "none"),
    "detect_format": ("enum:ObjectDetectionFormat", "none"),
    "gui_show_fish": ("tuple", [None, None]),
    "output_interpolate_positions": ("bool", False),
    "terminate_training": ("bool", False),
    "track_time_probability_enabled": ("bool", True),
    "track_history_split_threshold": ("optional", None),
    "pose_midline_indexes": ("list", []),
    "python_path": ("path", ""),
}


def cleanup(rows):
    for r in rows:
        if r["name"] in FIXUPS:
            r["type"], r["default"] = FIXUPS[r["name"]]
            continue
        if r["type"] != "raw":
            continue
        e = r["default_cpp"]
        m = re.match(r"^Float2_t\s*\(\s*(-?[\d.]+)f?\s*\)$", e)
        if m:
            r["type"], r["default"] = "float", float(m.group(1))
            continue
        m = re.match(r"^(-?[\d.]+)_F$", e)
        if m:
            r["type"], r["default"] = "float", float(m.group(1))
            continue
        m = re.match(r"^(?:file::)?Path\s*\(\s*(\"[^\"]*\")?\s*\)$", e)
        if m:
            r["type"], r["default"] = "path", parse_cpp_string(e)
            continue
        if re.match(r"^std::optional<.*>\s*(\{\s*\}|\(\s*\))$", e):
            r["type"], r["default"] = "optional", None
            continue
        if re.match(r"^std::(map|set)<.*>\s*(\{.*\}|\(\s*\))$", e, re.S):
            r["type"], r["default"] = ("dict" if "map" in e[:10] else "list"), ({} if "map" in e[:10] else [])
            continue
        if re.match(r"^[A-Za-z_][\w:]*\{\s*\}$", e):
            r["type"], r["default"] = "struct", None
            continue
    return rows


if __name__ == "__main__":
    ref = "/root/reference/Application/src"
    tracker_rows = cleanup(extract(ref + "/tracker/core/default_config.cpp"))
    grabber_rows = cleanup(extract(ref + "/grabber/misc/default_config.cpp"))
    deps = extract_deprecations(ref + "/tracker/core/default_config.cpp")
    seen = {r["name"]: r for r in tracker_rows}
    for r in grabber_rows:
        if r["name"] not in seen:
            r["category"] = "grabber"
            seen[r["name"]] = r
    for r in tracker_rows:
        r.setdefault("category", "tracker")
    table = {
        "parameters": sorted(seen.values(), key=lambda r: r["name"]),
        "deprecations": deps,
    }
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/trex_tpu/config/params_table.json"
    with open(out, "w") as f:
        json.dump(table, f, indent=1)
    raws = [r for r in table["parameters"] if r["type"] == "raw"]
    print(f"extracted {len(table['parameters'])} params ({len(raws)} raw), {len(deps)} deprecations")
    for r in raws[:40]:
        print("RAW:", r["name"], "=", r["default_cpp"][:80])
