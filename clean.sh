#!/usr/bin/env bash
# Remove run artifacts: TensorBoard event dirs and Python bytecode caches.
# (Counterpart of the reference's clean.sh, rebuilt with guards so a clean
# tree doesn't error.)
set -u

if [ -d runs ]; then
    rm -rf runs/*
    echo "cleaned runs/"
fi
find . -type d -name '__pycache__' -prune -exec rm -rf {} + 2>/dev/null || true
echo "cleaned __pycache__ dirs"
