#!/usr/bin/env bash
# Sequential local scheduling of (model, task) evaluation runs.
#
# Launch-layer parity with reference scripts/schedule_batch.sh, TPU-adapted: no
# accelerate launcher — one python process drives all local TPU chips; results land
# under OUTPUT/{task}/{model}/ so eval_metrics.py and eval_ranking.py can consume
# them by path convention.
set -o errexit
set -o nounset
set -o pipefail

if [[ "${TRACE-0}" == "1" ]]; then set -o xtrace; fi

if [[ "${1-}" =~ ^-*h(elp)?$ ]]; then
    echo 'usage: schedule_batch.sh [-h] [--models MODELS] [--tasks TASKS] [--limit LIMIT]
                                [--model-args ARGS] [--no-samples] [--no-wandb] [--output OUTPUT]

Schedule a batch of evaluation runs over all (model, task) pairs.

Options:
    --models <MODELS>     Comma-separated model ids (e.g. qwen2-vl-2b,llava-1.5-7b)
    --tasks <TASKS>       Comma-separated task names (e.g. caltech101,dtd)
    --limit <LIMIT>       Limit the number of samples per task
    --model-args <ARGS>   Comma-separated extra model args (e.g. pretrained=/ckpts/...)
    --no-samples          Disable logging samples to disk
    --no-wandb            Disable logging to Weights & Biases
    -o --output <OUTPUT>  Results output dir (default: logs/schedule)
'
    exit
fi

cd "$(dirname "$0")"
while [ "$(find . -maxdepth 1 -name pyproject.toml | wc -l)" -ne 1 ]; do cd ..; done

EVAL_MODELS=""
EVAL_MODELS_ARGS=""
EVAL_OUTPUT_DIR=logs/schedule
EVAL_TASKS=""
EVAL_SAMPLES_LIMIT=""
EVAL_SAMPLES_LOGGING=true
EVAL_WANDB_LOGGING=false
EVAL_WANDB_ARGS="project=lmms-owc-tpu,job_type=eval"

main() {
    while [[ $# -gt 0 ]]; do
        case $1 in
            --models) EVAL_MODELS="$2"; shift 2 ;;
            --tasks) EVAL_TASKS="$2"; shift 2 ;;
            --limit) EVAL_SAMPLES_LIMIT="$2"; shift 2 ;;
            --model-args|--models-args) EVAL_MODELS_ARGS="$2"; shift 2 ;;
            --no-samples) EVAL_SAMPLES_LOGGING=false; shift ;;
            --no-wandb) EVAL_WANDB_LOGGING=false; shift ;;
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
            mkdir -p "$out_dir"
            args=(--model "$model" --tasks "$task" --output_path "$out_dir")
            [[ -n "$EVAL_MODELS_ARGS" ]] && args+=(--model_args "$EVAL_MODELS_ARGS")
            [[ -n "$EVAL_SAMPLES_LIMIT" ]] && args+=(--limit "$EVAL_SAMPLES_LIMIT")
            [[ "$EVAL_SAMPLES_LOGGING" == true ]] && args+=(--log_samples)
            [[ "$EVAL_WANDB_LOGGING" == true ]] && args+=(--wandb_args "$EVAL_WANDB_ARGS,name=${model}_${task}")
            echo ">>> $model on $task -> $out_dir"
            python eval_model.py "${args[@]}" 2>&1 | tee "$out_dir/run.log"
        done
    done
}

main "$@"
