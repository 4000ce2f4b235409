#!/usr/bin/env bash
# Archive one experiment: snapshot the TensorBoard runs into the model's
# experiment dir, then zip that dir.  (Counterpart of the reference's
# collect.sh, rebuilt: model list is derived from config.py instead of
# hard-coded, and usage/errors go to stderr.)
set -eu

usage() {
    echo "usage: $0 <model> <archive-name>" >&2
    echo "  model: one of the registered model names (see config.py)" >&2
}

if [ $# -ne 2 ]; then
    usage
    exit 1
fi
model=$1
archive=$2

valid=$(python - <<'EOF'
from cs231_capsule_yolo_traffic_sign_detection_tpu import config
print(" ".join(config.model_names))
EOF
)
case " $valid " in
    *" $model "*) ;;
    *)
        echo "error: unknown model '$model' (valid: $valid)" >&2
        exit 1
        ;;
esac

mkdir -p "experiments/$model"
if [ -d runs ]; then
    cp -r runs "experiments/$model/"
fi
zip -r "experiments/${archive}.zip" "experiments/$model"
echo "wrote experiments/${archive}.zip"
