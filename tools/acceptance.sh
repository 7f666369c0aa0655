#!/usr/bin/env bash
# North-star acceptance runbook: torch-checkpoint import -> COCO mini-val
# sampling (PLMS 200, CFG 1.5) -> FID vs the ground-truth inputs.
#
# The reference's published acceptance number for this exact chain is
# FID ~= 64.85 on the 1000-image t2i mini-val (/root/reference/README.md:231,
# 242; ids in frido_tpu/data/eval_ids/image_ids_t2i_coco_mini.txt, wired by
# configs/frido/t2i/frido_f16f8_coco_mini.yaml). FID fluctuates a few points
# with the diffusion seed (/root/reference/README.md:243-244), hence TOL.
#
# The chain needs three external assets this zero-egress box doesn't ship.
# Run it the day they're mounted:
#   CKPT                  torch Frido t2i checkpoint (.ckpt)
#   FRIDO_TPU_INCEPTION   pytorch-fid InceptionV3 state_dict (.pth/.npz)
#   a BERT vocab          vendor once: python -m frido_tpu.text.vendor
#                         /path/to/vocab.txt   (or set FRIDO_TPU_BERT_VOCAB)
# plus COCO 2014 val at the config's data_path (override with DATA_PATH).
#
# Knobs (env):
#   CFG=configs/frido/t2i/frido_f16f8_coco_mini.yaml
#   STEPS=200 BS=10 N=-1 OUT=exp/acceptance SEED=42
#   EXPECTED_FID=64.85 TOL=8     (EXPECTED_FID="" skips the comparison)
#   DATA_PATH=                   (dotlist-overrides every dataset split)
#   EXTRA_OVERRIDES=             (extra a.b=c dotlist entries)
#
# Exercised end-to-end at toy scale by tests/test_acceptance_chain.py so
# every link stays green until the real assets appear.
set -euo pipefail
cd "$(dirname "$0")/.."

CFG="${CFG:-configs/frido/t2i/frido_f16f8_coco_mini.yaml}"
STEPS="${STEPS:-200}"
BS="${BS:-10}"
N="${N:--1}"
OUT="${OUT:-exp/acceptance}"
SEED="${SEED:-42}"
EXPECTED_FID="${EXPECTED_FID-64.85}"
TOL="${TOL:-8}"

missing=0
note() { echo "acceptance: $*" >&2; }
need() { note "MISSING: $*"; missing=1; }
# one grep-able machine-readable artifact per run (VERDICT r3 #7):
# RESULT.json with status pass|fail|nogate and the measured FID
result() { # $1=status $2=fid (may be "")
    mkdir -p "$OUT/acceptance"
    printf '{"status": "%s", "fid": %s, "expected_fid": %s, "tol": %s, "cfg": "%s", "steps": %s, "seed": %s}\n' \
        "$1" "${2:-null}" "${EXPECTED_FID:-null}" "$TOL" "$CFG" "$STEPS" "$SEED" \
        | tee "$OUT/acceptance/RESULT.json"
}

[ -n "${CKPT:-}" ] || need "CKPT — path to the torch Frido t2i checkpoint \
(reference tools/download.sh fetches it as frido_t2i.ckpt)"
[ -z "${CKPT:-}" ] || [ -f "$CKPT" ] || need "CKPT=$CKPT does not exist"
[ -n "${FRIDO_TPU_INCEPTION:-}" ] || need "FRIDO_TPU_INCEPTION — pytorch-fid \
InceptionV3 weights (pt_inception-2015-12-05-6726825d.pth or .npz)"
[ -z "${FRIDO_TPU_INCEPTION:-}" ] || [ -f "$FRIDO_TPU_INCEPTION" ] || \
    need "FRIDO_TPU_INCEPTION=$FRIDO_TPU_INCEPTION does not exist"
if [ -z "${FRIDO_TPU_BERT_VOCAB:-}" ] && \
   [ ! -f frido_tpu/text/vendored/bert_vocab.txt ]; then
    need "BERT vocab — vendor one: python -m frido_tpu.text.vendor \
/path/to/vocab.txt (or set FRIDO_TPU_BERT_VOCAB)"
fi
if [ "$missing" != 0 ]; then
    note "chain not runnable yet; mount the assets above and re-run."
    exit 2
fi

overrides=()
if [ -n "${DATA_PATH:-}" ]; then
    for split in train validation test; do
        overrides+=("data.params.${split}.params.data_path=${DATA_PATH}")
    done
fi
# shellcheck disable=SC2206
[ -z "${EXTRA_OVERRIDES:-}" ] || overrides+=(${EXTRA_OVERRIDES})

# strict vocab: an imported checkpoint must never silently tokenize through
# the non-canonical fallback vocab
export FRIDO_TPU_STRICT_VOCAB=1

note "sampling: $CFG, PLMS $STEPS steps, CFG 1.5, ckpt=$CKPT"
python3 scripts/sample_diffusion.py \
    -cfg "$CFG" -r "$CKPT" -o "$OUT" -name acceptance \
    -plms -G -gs 1.5 -c "$STEPS" -bs "$BS" -n "$N" --seed "$SEED" \
    "${overrides[@]}"

if [ -z "$(ls -A "$OUT/acceptance/sample" 2>/dev/null)" ]; then
    note "FAIL: sampling wrote nothing to $OUT/acceptance/sample — check \
the config's test split (data_path? img_id_file ids are 12-digit strings)"
    exit 1
fi

note "computing FID (fake=$OUT/acceptance/sample, real=$OUT/acceptance/inputs)"
fid_line=$(python3 scripts/eval_fid.py \
    --real "$OUT/acceptance/inputs" --fake "$OUT/acceptance/sample" \
    | tee /dev/stderr | grep -E '^FID:')
fid=${fid_line#FID: }

if [ -n "$EXPECTED_FID" ]; then
    ok=$(python3 -c "print(int(abs($fid - $EXPECTED_FID) <= $TOL))")
    if [ "$ok" = 1 ]; then
        note "PASS: FID $fid within +/-$TOL of the reference's $EXPECTED_FID"
        result pass "$fid"
    else
        note "FAIL: FID $fid outside +/-$TOL of the reference's $EXPECTED_FID"
        result fail "$fid"
        exit 1
    fi
else
    note "done: FID $fid (no expected value configured)"
    result nogate "$fid"
fi
