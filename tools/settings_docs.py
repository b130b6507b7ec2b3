#!/usr/bin/env python3
"""Generate parameter documentation RST from the settings registry
(role of the reference's tools/settings_docs.cpp -> docs/parameters_trex.rst
and the `-task rst` dump, main.cpp:92-106)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from trex_tpu.config import format_value, global_settings


def generate_rst() -> str:
    s = global_settings()
    lines = [
        ".. toctree::",
        "   :maxdepth: 2",
        "",
        "TRex parameters",
        "===============",
        "",
    ]
    for name in s.names():
        p = s.param(name)
        lines.append(f".. function:: {name}({p.type})")
        lines.append("")
        lines.append(f"\t**default value:** {format_value(p.default)}")
        lines.append("")
        if p.access.name != "PUBLIC":
            lines.append(f"\t**access level:** {p.access.name}")
            lines.append("")
        if p.doc:
            lines.append(f"\t{p.doc}")
            lines.append("")
        lines.append("")
    return "\n".join(lines)


if __name__ == "__main__":
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else \
        Path(__file__).resolve().parents[1] / "docs" / "parameters_trex.rst"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(generate_rst())
    print(f"wrote {out}")
