#!/usr/bin/env bash
# Refresh the vendored public-data resources and re-stamp provenance.
#
# This environment has NO network egress, so both refreshes are
# offline:
#   - public_suffix_list.dat  <- the system publicsuffix package copy
#     (/usr/share/publicsuffix/public_suffix_list.dat; upstream is
#     https://publicsuffix.org/list/public_suffix_list.dat). The
#     upstream body is kept verbatim below a '//' provenance header
#     (PSL comment syntax — the loader skips it).
#   - html_entities.tsv       <- regenerated from Python stdlib
#     html.entities.html5, the WHATWG entities.json mirror
#     (tools/gen_html_entities.py stamps its own header + payload
#     hash).
#
# On a networked machine, replace the PSL source with the upstream URL
# and diff against the recorded upstream-file-sha256 before swapping.
set -euo pipefail
cd "$(dirname "$0")/.."

PSL_SRC=/usr/share/publicsuffix/public_suffix_list.dat
PSL_DST=src/main/resources/graft/public_suffix_list.dat

SHA=$(sha256sum "$PSL_SRC" | cut -d' ' -f1)
{
  echo "// ---- graft vendoring provenance (prepended comment; the PSL format"
  echo "// ---- treats '//' lines as comments and the loader skips them) ----"
  echo "// Snapshot: $(date +%F), copied verbatim from the Debian publicsuffix"
  echo "// package copy at $PSL_SRC"
  echo "// (upstream: https://publicsuffix.org/list/public_suffix_list.dat)."
  echo "// upstream-file-sha256: $SHA"
  echo "// Refresh with tools/refresh_vendored.sh (offline: re-copies the"
  echo "// system snapshot; this environment has no network egress)."
  echo "// ------------------------------------------------------------------"
  cat "$PSL_SRC"
} > "$PSL_DST"
echo "refreshed $PSL_DST (upstream sha256 $SHA)"

python3 tools/gen_html_entities.py

echo "verify: sbt -batch 'testOnly graft.UrlSpec graft.OpsSpec'"

python3 tools/train_bpe.py
