#!/usr/bin/env bash
# Scale-out scheduling of (model, task) runs as independent TPU jobs.
#
# Launch-layer parity with reference scripts/schedule_sbatch.sh (Slurm array jobs of
# independent per-pair runs), rewritten for TPU fleets: each (model, task) pair is
# submitted as one command the cluster manager executes on a TPU slice. The submit
# command is pluggable via $SUBMIT (e.g. an `xpk workload create ...` or
# `gcloud compute tpus tpu-vm ssh ... --command` wrapper); it defaults to local
# sequential execution so the script degrades to schedule_batch.sh behavior.
set -o errexit
set -o nounset
set -o pipefail

if [[ "${1-}" =~ ^-*h(elp)?$ ]]; then
    echo 'usage: SUBMIT="<submit-cmd>" schedule_xpk.sh [--models MODELS] [--tasks TASKS]
                 [--limit LIMIT] [--model-args ARGS] [--output OUTPUT]

Submit one job per (model, task) pair. Each job runs:
    python eval_model.py --model $m --tasks $t --output_path $out --log_samples ...

Environment:
    SUBMIT   command prefix used to submit each job (default: "bash -c", local run)
'
    exit
fi

cd "$(dirname "$0")"
while [ "$(find . -maxdepth 1 -name pyproject.toml | wc -l)" -ne 1 ]; do cd ..; done

SUBMIT=${SUBMIT:-"bash -c"}
EVAL_MODELS=""
EVAL_MODELS_ARGS=""
EVAL_OUTPUT_DIR=logs/schedule
EVAL_TASKS=""
EVAL_SAMPLES_LIMIT=""

while [[ $# -gt 0 ]]; do
    case $1 in
        --models) EVAL_MODELS="$2"; shift 2 ;;
        --tasks) EVAL_TASKS="$2"; shift 2 ;;
        --limit) EVAL_SAMPLES_LIMIT="$2"; shift 2 ;;
        --model-args|--models-args) EVAL_MODELS_ARGS="$2"; shift 2 ;;
        -o|--output) EVAL_OUTPUT_DIR="$2"; shift 2 ;;
        *) echo "unknown option: $1" >&2; exit 2 ;;
    esac
done

[[ -z "$EVAL_MODELS" || -z "$EVAL_TASKS" ]] && { echo "--models and --tasks are required" >&2; exit 2; }

IFS=',' read -ra models <<< "$EVAL_MODELS"
IFS=',' read -ra tasks <<< "$EVAL_TASKS"

for task in "${tasks[@]}"; do
    for model in "${models[@]}"; do
        out_dir="$EVAL_OUTPUT_DIR/$task/$model"
        cmd="mkdir -p $out_dir && python eval_model.py --model $model --tasks $task --output_path $out_dir --log_samples"
        [[ -n "$EVAL_MODELS_ARGS" ]] && cmd+=" --model_args $EVAL_MODELS_ARGS"
        [[ -n "$EVAL_SAMPLES_LIMIT" ]] && cmd+=" --limit $EVAL_SAMPLES_LIMIT"
        echo ">>> submitting: $model on $task"
        $SUBMIT "$cmd"
    done
done
