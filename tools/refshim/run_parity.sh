#!/usr/bin/env bash
# Run the reference library's own pytest suite against our engine via refshim.
#
# Excluded files test reference-internal plumbing with no public contract:
#   - tests/utils/test_string_file_wrapper.py (private get_buffer/_ensure_chunk_position)
#   - tests/test_type_inference.py            (mypy overload inference of the reference package)
#   - tests/test_performance.py              (pytest-benchmark; covered by bench.py instead)
#   - tests/test_docs_app_schema.py          (imports the reference repo's docs/ FastAPI app)
#   - tests/profiler.py                      (not a test)
set -euo pipefail
REPO="$(cd "$(dirname "$0")/../.." && pwd)"
REF="${REF:-/root/reference}"
WORK="$(mktemp -d /tmp/refparity.XXXXXX)"
trap 'rm -rf "$WORK"' EXIT

cp -r "$REPO/tools/refshim/src" "$WORK/src"
mkdir -p "$WORK/tests/utils"
for f in test_json_repair.py test_parse_array.py test_parse_comment.py \
         test_parse_number.py test_parse_object.py test_parse_string.py \
         test_repair_json_cli.py test_repair_json_from_file.py \
         test_schema_guided_parse.py test_schema_parser_paths.py \
         test_schema_repairer.py test_strict_mode.py \
         valid.json invalid.json __init__.py; do
  cp "$REF/tests/$f" "$WORK/tests/$f"
done

cd "$WORK"
PYTHONPATH="$REPO:$WORK" python -m pytest tests/ -q "$@"
