#!/usr/bin/env python3
"""Regenerate src/main/resources/graft/html_entities.tsv from the
WHATWG HTML named-character-reference table (public data; the HTML
spec's entities.json list, mirrored verbatim by Python's stdlib
html.entities.html5 dict).

Only the spec-canonical ';'-terminated names are emitted: the engine's
decoder (graft.functions.HtmlEntityHelper) requires a terminating
semicolon, matching its decode-once / malformed-verbatim contract.
Values are written as space-separated hex code points (ASCII-only
resource; 93 names map to TWO code points, e.g. NotEqualTilde).

Run offline — the table ships with the Python stdlib, no network.
"""
import hashlib
import html.entities
import sys
from datetime import date, timezone, datetime

OUT = "src/main/resources/graft/html_entities.tsv"

def main():
    d = {k[:-1]: v for k, v in html.entities.html5.items() if k.endswith(";")}
    lines = []
    for name in sorted(d):
        cps = " ".join(f"{ord(ch):X}" for ch in d[name])
        lines.append(f"{name}\t{cps}")
    payload = "\n".join(lines) + "\n"
    digest = hashlib.sha256(payload.encode("utf-8")).hexdigest()
    header = (
        "# WHATWG HTML named character references (';'-terminated names only).\n"
        "# Source: the HTML Standard's entities.json (public data), as mirrored\n"
        "# by Python stdlib html.entities.html5 (regenerate with\n"
        "# tools/gen_html_entities.py; no network needed).\n"
        f"# Snapshot: {date.today().isoformat()}  python={sys.version.split()[0]}"
        f"  names={len(d)}\n"
        f"# payload-sha256: {digest}\n"
        "# Format: name<TAB>hex-codepoint[ hex-codepoint]\n"
    )
    with open(OUT, "w", encoding="utf-8") as f:
        f.write(header)
        f.write(payload)
    print(f"wrote {OUT}: {len(d)} names, payload sha256 {digest}")

if __name__ == "__main__":
    main()
