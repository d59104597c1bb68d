#!/usr/bin/env bash
# Lint pipeline (reference analog: linter.sh = isort + yapf + flake8).
# This image ships none of those; pyflakes-style checks via compileall +
# a simple grep policy are the fallback. Extend when tooling is available.
set -e
echo "=> syntax check (compileall)"
python -m compileall -q ieee_tpu scripts tools tests bench.py __graft_entry__.py
echo "=> no torch imports inside ieee_tpu (TPU-native rule; torch is test-only)"
if grep -rn "^import torch\|^from torch" ieee_tpu/ --include="*.py"; then
    echo "ERROR: torch import inside ieee_tpu/"; exit 1
fi
echo "OK"
