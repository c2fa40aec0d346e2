#!/bin/bash
# Full staged recipe on a tiny synthetic corpus (BASELINE.json config 5):
#   1. ASR pretrain (LAS)
#   2. gather the average dynamic embedding artifact (translate mode 3)
#   3. MT pretrain consuming the artifact
#   4. joint ASR_ST training, loading the ASR checkpoint (load_mode ASR)
#   5. ST finetune from the joint model (load_mode ALL-PARTIAL, frozen LAS)
#   6. beam-search ST inference (translate mode 1)
#
# Usage: scripts/run_full_recipe.sh [workdir]
# Runs on whatever JAX backend is available (CPU ok: tiny dims).
#
# Measured TPU defaults for REAL corpora (this smoke recipe keeps tiny
# values for its 24-sentence corpus):
#   --batch_size 32 --minibatch_partition 1   samples/s saturates at 32
#                                             (scripts/probe_train_batch.py)
#   --dtype bfloat16                          throughput runs; f32 for strict
#                                             reference parity (quality gate
#                                             validated loss-scale-free)
#   --feat_dtype int8                         4x less feature H2D on
#                                             bandwidth-limited hosts
#   --device_cache True                       corpus-resident features when
#                                             they fit HBM (~6 GB / 400 h
#                                             at int8): epochs >= 2 move only
#                                             token ids over the link
#   translate: --batch_size 64                bulk beam decode saturates at 64
#                                             (scripts/probe_serving_batch.py)
set -e
cd "$(dirname "$0")/.."
WORK=${1:-/tmp/stjep_recipe}
rm -rf "$WORK"
mkdir -p "$WORK"

python - "$WORK" <<'EOF'
import sys
sys.path.insert(0, '.')
from tests.data_factory import make_corpus
make_corpus(sys.argv[1] + '/data', n_sent=24)
EOF
DATA="$WORK/data"

COMMON="--path_vocab_src $DATA/vocab.src --path_vocab_tgt $DATA/vocab.tgt \
  --las_acous_dim 8 --las_acous_hidden_size 6 --las_acous_norm False \
  --dim_model 16 --dim_feedforward 32 --num_heads 2 --enc_layers 2 --dec_layers 2 \
  --embedding_size_enc 8 --embedding_size_dec 16 \
  --max_seq_len_src 16 --max_seq_len_tgt 32 --batch_size 8 --minibatch_partition 1 \
  --checkpoint_every 3 --print_every 3 \
  --learning_rate 0.004 --learning_rate_init 0.004 --lr_warmup_steps 0 \
  --use_type char"

latest() { python -c "
from stjep_tpu.train.checkpoint import Checkpoint
print(Checkpoint.get_latest_checkpoint('$1'))"; }

echo '=== [1/6] ASR pretrain ==='
python train.py --mode ASR --save "$WORK/asr" $COMMON --num_epochs 2 \
  --asr_train_path_src "$DATA/train.src" --asr_train_acous_path "$DATA/train.flis" \
  --asr_dev_path_src "$DATA/train.src" --asr_dev_acous_path "$DATA/train.flis" \
  > "$WORK/log.asr" 2>&1
ASR_CKPT=$(latest "$WORK/asr")
echo "asr ckpt: $ASR_CKPT"

echo '=== [2/6] gather dyn_emb_ave artifact ==='
python translate.py --eval_mode 3 --load "$ASR_CKPT" \
  --test_path_src "$DATA/train.src" --test_path_tgt "$DATA/train.tgt" \
  --test_acous_path "$DATA/train.flis" --test_path_out "$WORK/emb" \
  --batch_size 8 > "$WORK/log.emb" 2>&1
test -f "$WORK/emb/dyn_emb_ave.npy"
echo "artifact: $WORK/emb/dyn_emb_ave.npy"

echo '=== [3/6] MT pretrain (uses artifact) ==='
python train.py --mode MT --save "$WORK/mt" $COMMON --num_epochs 2 \
  --loss_nll_mt_coeff 1.0 --emb_dyn_ave "$WORK/emb/dyn_emb_ave.npy" \
  --mt_train_path_src "$DATA/train.src" --mt_train_path_tgt "$DATA/train.tgt" \
  --mt_dev_path_src "$DATA/train.src" --mt_dev_path_tgt "$DATA/train.tgt" \
  > "$WORK/log.mt" 2>&1
echo "mt ckpt: $(latest "$WORK/mt")"

echo '=== [4/6] joint ASR_ST (loads ASR ckpt) ==='
python train.py --mode ASR_ST --save "$WORK/asr_st" $COMMON --num_epochs 2 \
  --load "$ASR_CKPT" --load_mode ASR \
  --loss_nll_asr_coeff 1.0 --loss_nll_st_coeff 1.0 \
  --emb_dyn_ave "$WORK/emb/dyn_emb_ave.npy" \
  --st_train_path_src "$DATA/train.src" --st_train_path_tgt "$DATA/train.tgt" \
  --st_train_acous_path "$DATA/train.flis" \
  --st_dev_path_src "$DATA/train.src" --st_dev_path_tgt "$DATA/train.tgt" \
  --st_dev_acous_path "$DATA/train.flis" \
  > "$WORK/log.asr_st" 2>&1
JOINT_CKPT=$(latest "$WORK/asr_st")
echo "joint ckpt: $JOINT_CKPT"

echo '=== [5/6] ST finetune (ALL-PARTIAL: frozen LAS) ==='
python train.py --mode ST --save "$WORK/st" $COMMON --num_epochs 1 \
  --load "$JOINT_CKPT" --load_mode ALL-PARTIAL --load_freeze True \
  --loss_nll_st_coeff 1.0 \
  --st_train_path_src "$DATA/train.src" --st_train_path_tgt "$DATA/train.tgt" \
  --st_train_acous_path "$DATA/train.flis" \
  --st_dev_path_src "$DATA/train.src" --st_dev_path_tgt "$DATA/train.tgt" \
  --st_dev_acous_path "$DATA/train.flis" \
  > "$WORK/log.st" 2>&1
ST_CKPT=$(latest "$WORK/st")
echo "st ckpt: $ST_CKPT"

echo '=== [6/6] beam-search ST inference ==='
python translate.py --eval_mode 1 --gen_mode ST --load "$ST_CKPT" \
  --test_path_src "$DATA/train.src" --test_path_tgt "$DATA/train.tgt" \
  --test_acous_path "$DATA/train.flis" --test_path_out "$WORK/decode" \
  --batch_size 8 --beam_width 3 --max_seq_len 32 > "$WORK/log.decode" 2>&1
echo "decoded lines: $(wc -l < "$WORK/decode/translate.txt")"
head -3 "$WORK/decode/translate.txt" | sed 's/^/  > /'
echo 'FULL RECIPE OK'
