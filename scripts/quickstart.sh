#!/usr/bin/env bash
# End-to-end quickstart on the SYNTHETIC corpus (the real 11,144-sample
# ComMU dataset is not redistributable): corpus -> train -> generate.
#
#   bash scripts/quickstart.sh [BASE_DIR]          # full-size model (TPU)
#   SMALL=1 bash scripts/quickstart.sh [BASE_DIR]  # reduced model (CPU, ~3 min)
#
# Expected artifacts under BASE_DIR (default ./quickstart):
#   output_npy/{input,target}_{train,val}.npy   the tokenized corpus
#   work/<timestamp>/{checkpoint_best,checkpoint_last,config.yml,train.log}
#   out/main_melody_acoustic_piano_mid/*.mid    generated standard MIDI
#
# With real data instead, start from:  python preprocess.py --root_dir
# ./dataset --csv_path ./dataset/commu_meta.csv  (reference README workflow).
set -euo pipefail
cd "$(dirname "$0")/.."
BASE="${1:-./quickstart}"

echo "== 1/3 synthetic corpus -> ${BASE}/output_npy"
# full-size training packs a 256-row global batch, so the train split must
# hold more than 256 sequences; the reduced SMALL model needs far fewer
N=$([[ "${SMALL:-0}" == "1" ]] && echo 200 || echo 400)
python scripts/make_synthetic_corpus.py "${BASE}/output_npy" --n "$N"

SMALL_OVERRIDES=()
if [[ "${SMALL:-0}" == "1" ]]; then
  export JAX_PLATFORMS="${JAX_PLATFORMS:-cpu}"
  SMALL_OVERRIDES=(
    --set model.num_layers=2 --set model.num_heads=2
    --set model.units=64 --set model.inner_size=128
    --set train.batch_size=16 --set train.tgt_length=32
    --set train.mem_length=64
    --set evaluate.batch_size=4 --set evaluate.tgt_length=32
    --set evaluate.mem_length=64
    --dtype float32
  )
  GEN_SMALL=(--gen_length 256)
fi

echo "== 2/3 train 300 steps -> ${BASE}/work"
python train.py --data_dir "${BASE}/output_npy" --work_dir "${BASE}/work" \
    --max_step 300 \
    --set train.warmup_step=50 --set train.eval_interval=100 \
    --set train.log_interval=50 \
    "${SMALL_OVERRIDES[@]}"

CKPT_DIR="$(ls -dt "${BASE}"/work/*/ | head -1)"
echo "== 3/3 generate 2 samples from ${CKPT_DIR}checkpoint_best -> ${BASE}/out"
# --lenient: a 300-step model rarely satisfies the musical validators yet
python generate.py --checkpoint_dir "${CKPT_DIR}checkpoint_best" \
    --output_dir "${BASE}/out" \
    --bpm 70 --audio_key aminor --time_signature 4/4 --pitch_range mid \
    --num_measures 8 --inst acoustic_piano --genre newage \
    --min_velocity 60 --max_velocity 80 --track_role main_melody \
    --rhythm standard --num_generate 2 --lenient \
    ${GEN_SMALL[@]+"${GEN_SMALL[@]}"} \
    --chord_progression "$(python - <<'PY'
print("-".join((["Am"] * 16 + ["F"] * 16 + ["C"] * 16 + ["G"] * 16)))
PY
)"

ls -l "${BASE}/out"/main_melody_acoustic_piano_mid/
echo "quickstart OK"
