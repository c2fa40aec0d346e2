"""Training CLI — same flag surface as the reference (ref: train.py:21-127).

Usage mirrors the reference exactly:
    python train.py --mode ASR --save expt ... (see --help)

TPU-native additions (all optional):
    --emb_dyn_ave       path to the dyn_emb_ave.npy artifact (the reference
                        hardcodes this path inside the model ctor,
                        ref: models/Seq2seq.py:64-66)
    --length_bucket     sort batches by length for fewer XLA shapes
    --dtype             compute dtype (float32|bfloat16)
    --feat_dtype        feature staging dtype (auto|float32|bfloat16|int8);
                        int8 stages per-utterance-quantized features and
                        dequantizes on device — 4x less H2D than float32
    --device_cache      keep the whole corpus of features device-resident
                        and gather minibatches on-device (epochs >= 2 move
                        only token ids over the link)
"""

import argparse
import os

from stjep_tpu.config import ModelConfig, save_config, validate_config
from stjep_tpu.data.dataset import Dataset
from stjep_tpu.utils.misc import set_global_seeds


def load_arguments(parser):
    """ref: train.py:21-127 — flag names preserved verbatim."""

    # acous params
    parser.add_argument('--las_acous_dim', type=int, default=40, help='acoustic feature dimension')
    parser.add_argument('--las_acous_hidden_size', type=int, default=256, help='acoustics hidden size')
    parser.add_argument('--las_acous_max_len', type=int, default=3000, help='maximum acous length')
    parser.add_argument('--las_acous_norm', type=str, default='True', help='input acoustic fbk normalisation')

    # data
    parser.add_argument('--loss_nll_asr_coeff', type=float, default=0.0, help='En nll loss coeff')
    parser.add_argument('--loss_nll_st_coeff', type=float, default=0.0, help='De nll loss coeff')
    parser.add_argument('--loss_nll_mt_coeff', type=float, default=0.0, help='De nll loss coeff')

    # paths-3way
    parser.add_argument('--st_data_ratio', type=float, default=1.0, help='data partition being used')
    parser.add_argument('--st_acous_norm_path', type=str, default=None, help='acoustics norm')
    parser.add_argument('--st_train_acous_path', type=str, default=None, help='train set acoustics')
    parser.add_argument('--st_dev_acous_path', type=str, default=None, help='dev set acoustics')
    parser.add_argument('--st_train_path_src', type=str, default=None, help='train src dir')
    parser.add_argument('--st_train_path_tgt', type=str, default=None, help='train src dir')
    parser.add_argument('--st_dev_path_src', type=str, default=None, help='dev src dir')
    parser.add_argument('--st_dev_path_tgt', type=str, default=None, help='dev src dir')

    # paths-asr
    parser.add_argument('--asr_data_ratio', type=float, default=1.0, help='data partition being used')
    parser.add_argument('--asr_train_acous_norm_path', type=str, default=None, help='asr train acoustics norm')
    parser.add_argument('--asr_train_acous_path', type=str, default=None, help='asr train set acoustics')
    parser.add_argument('--asr_train_path_src', type=str, default=None, help='asr train src dir')
    parser.add_argument('--asr_dev_acous_norm_path', type=str, default=None, help='asr dev acoustics norm')
    parser.add_argument('--asr_dev_acous_path', type=str, default=None, help='asr dev set acoustics')
    parser.add_argument('--asr_dev_path_src', type=str, default=None, help='asr dev src dir')

    # paths-mt
    parser.add_argument('--mt_data_ratio', type=float, default=1.0, help='data partition being used')
    parser.add_argument('--mt_train_path_src', type=str, default=None, help='mt train src dir')
    parser.add_argument('--mt_train_path_tgt', type=str, default=None, help='mt train src dir')
    parser.add_argument('--mt_dev_path_src', type=str, default=None, help='mt dev src dir')
    parser.add_argument('--mt_dev_path_tgt', type=str, default=None, help='mt dev src dir')

    # vocab
    parser.add_argument('--path_vocab_src', type=str, default=None, help='vocab src dir')
    parser.add_argument('--path_vocab_tgt', type=str, default=None, help='vocab src dir')
    parser.add_argument('--load_embedding_src', type=str, default=None, help='pretrained embedding src')
    parser.add_argument('--load_embedding_tgt', type=str, default=None, help='pretrained embedding tgt')

    parser.add_argument('--save', type=str, required=True, help='model save dir')
    parser.add_argument('--load', type=str, default=None, help='model load dir')
    parser.add_argument('--load_freeze', type=str, default=None, help='Freeze loaded parameters or not')
    parser.add_argument('--load_mode', type=str, default=None,
        help='null | resume | restart | LAS | ASR | AE-ASR | AE-ASR-MT')

    # model
    parser.add_argument('--use_type', type=str, default='char', help='use char level prediction for nmt')
    parser.add_argument('--share_embedder', type=str, default='False', help='share embedder or not')
    parser.add_argument('--embedding_size_enc', type=int, default=200, help='embedding size encoder')
    parser.add_argument('--embedding_size_dec', type=int, default=200, help='embedding size decoder')
    parser.add_argument('--enc_emb_proj', type=str, default='False', help='encoder embedding projection')
    parser.add_argument('--dec_emb_proj', type=str, default='False', help='decoder embedding projection')

    parser.add_argument('--num_heads', type=int, default=8, help='multi head attention')
    parser.add_argument('--dim_model', type=int, default=512, help='dim_model')
    parser.add_argument('--dim_feedforward', type=int, default=1024, help='dim_feedforward')
    parser.add_argument('--enc_layers', type=int, default=6, help='number of encoder layers')
    parser.add_argument('--dec_layers', type=int, default=6, help='number of decoder layers')
    parser.add_argument('--transformer_type', type=str, default='standard', help='universal | standard')
    parser.add_argument('--act', type=str, default='False', help='universal transformer, dynamic hault')

    # misc
    parser.add_argument('--eval_with_mask', type=str, default='True', help='calc loss excluding padded words')
    parser.add_argument('--embedding_dropout', type=float, default=0.0, help='embedding dropout')
    parser.add_argument('--dropout', type=float, default=0.0, help='dropout')
    parser.add_argument('--seqrev', type=str, default='False', help='reverse src, tgt sequence')

    # train
    parser.add_argument('--random_seed', type=int, default=333, help='random seed')
    parser.add_argument('--gpu_id', type=int, default=0, help='only used for memory reservation')
    parser.add_argument('--use_gpu', type=str, default='False', help='whether or not using GPU')
    parser.add_argument('--num_epochs', type=int, default=10, help='number of training epoches')
    parser.add_argument('--max_seq_len_src', type=int, default=32, help='maximum src sequence length')
    parser.add_argument('--max_seq_len_tgt', type=int, default=32, help='maximum tgt sequence length')
    parser.add_argument('--batch_size', type=int, default=64, help='batch size')
    parser.add_argument('--minibatch_partition', type=int, default=20, help='separate into minibatch - avoid OOM')
    parser.add_argument('--learning_rate', type=float, default=0.00001, help='learning rate')
    parser.add_argument('--learning_rate_init', type=float, default=0.0005, help='learning rate init')
    parser.add_argument('--lr_warmup_steps', type=int, default=12000, help='lr warmup steps')
    parser.add_argument('--normalise_loss', type=str, default='True', help='normalise loss or not')
    parser.add_argument('--max_grad_norm', type=float, default=1.0,
        help='optimiser gradient norm clipping: max grad norm')
    parser.add_argument('--mode', type=str, default='ASR',
        help='operating mode: combination of AE|ASR|MT|ST following this order')

    # save and print
    parser.add_argument('--grab_memory', type=str, default='True', help='grab full GPU memory')
    parser.add_argument('--max_count_no_improve', type=int, default=2,
        help='if meet max, operate roll back')
    parser.add_argument('--max_count_num_rollback', type=int, default=2,
        help='if meet max, reduce learning rate')
    parser.add_argument('--keep_num', type=int, default=1,
        help='number of models to keep')
    parser.add_argument('--checkpoint_every', type=int, default=10,
        help='save ckpt every n steps')
    parser.add_argument('--print_every', type=int, default=10,
        help='print every n steps')

    # --- TPU-native additions ---
    parser.add_argument('--emb_dyn_ave', type=str, default=None,
        help='path to dyn_emb_ave.npy (average dynamic embedding artifact)')
    parser.add_argument('--length_bucket', type=str, default='False',
        help='length-bucketed batching for fewer XLA shapes')
    parser.add_argument('--dtype', type=str, default='float32',
        help='compute dtype: float32 | bfloat16')
    parser.add_argument('--acous_bucket', type=int, default=256,
        help='acoustic time-axis shape bucket (frames); limits XLA recompiles')
    parser.add_argument('--remat', type=str, default='False',
        help='rematerialise transformer layers in backward (saves HBM)')
    parser.add_argument('--n_model', type=int, default=1,
        help='tensor-parallel degree of the (data, model) device mesh; '
             'the data axis gets the remaining devices')
    parser.add_argument('--feat_dtype', type=str, default='auto',
        choices=['auto', 'float32', 'bfloat16', 'int8'],
        help='acoustic-feature staging dtype: auto (= follow --dtype) | '
             'float32 | bfloat16 | int8 (per-utterance scale, on-device '
             'dequant — 4x less host->device traffic than float32)')
    parser.add_argument('--device_cache', type=str, default='auto',
        help='keep the whole corpus of acoustic features resident on '
             'device (at --feat_dtype precision) and gather minibatches '
             'on-device: per-epoch feature H2D and np.load/CMVN drop to '
             'zero after epoch 1; needs the corpus to fit in HBM '
             '(a 400h fbank corpus is ~6 GB at int8). auto (default) '
             'enables it when the estimated footprint fits the free-HBM '
             'budget and logs the decision; True forces, False disables')
    parser.add_argument('--train_window', type=int, default=1,
        help='multi-step executor: with --device_cache, run up to K '
             'consecutive train steps as ONE jitted program (lax.scan over '
             'steps) — removes per-step dispatch/host-loop overhead on '
             'remote-attached chips; 1 disables (default: at minibatch 32 '
             'the dispatch floor is ~4%% of the step, measured within '
             'tunnel variance, while the scan program compiles ~4x slower '
             '— enable for dispatch-bound configs: tiny models/batches)')

    return parser


def build_datasets(config, t):
    """ref: train.py:188-367 — build up to 3 Dataset pairs keyed by mode."""
    path_vocab_src = config['path_vocab_src']
    path_vocab_tgt = config['path_vocab_tgt']
    mode = config['mode']
    length_bucket = bool(config.get('length_bucket'))
    vocab_info = {}

    train_sets = {'st': None, 'asr': None, 'mt': None}
    dev_sets = {'st': None, 'asr': None, 'mt': None}

    def _mk(mode_key, **kw):
        return Dataset(
            path_vocab_src=path_vocab_src, path_vocab_tgt=path_vocab_tgt,
            use_type=config['use_type'], seqrev=config['seqrev'],
            max_seq_len_src=config['max_seq_len_src'],
            max_seq_len_tgt=config['max_seq_len_tgt'],
            batch_size=config['batch_size'], use_gpu=config['use_gpu'],
            mode=mode_key, logger=t.logger, seed=config['random_seed'],
            length_bucket=length_bucket, **kw,
        )

    if 'ST' in mode:
        if config['st_train_path_src']:
            t.logger.info(' -- load ST train set -- ')
            train_sets['st'] = _mk(
                'ST', path_src=config['st_train_path_src'],
                path_tgt=config['st_train_path_tgt'],
                acous_path=config['st_train_acous_path'],
                acous_norm=config['las_acous_norm'],
                acous_norm_path=config['st_acous_norm_path'],
                acous_max_len=config['las_acous_max_len'],
                data_ratio=config['st_data_ratio'],
            )
            vocab_info['set'] = train_sets['st']
        if config['st_dev_path_src']:
            t.logger.info(' -- load ST dev set -- ')
            dev_sets['st'] = _mk(
                'ST', path_src=config['st_dev_path_src'],
                path_tgt=config['st_dev_path_tgt'],
                acous_path=config['st_dev_acous_path'],
                acous_norm=config['las_acous_norm'],
                acous_norm_path=config['st_acous_norm_path'],
                acous_max_len=config['las_acous_max_len'],
            )

    if 'ASR' in mode:
        if config['asr_train_path_src']:
            t.logger.info(' -- load ASR train set -- ')
            train_sets['asr'] = _mk(
                'ASR', path_src=config['asr_train_path_src'],
                acous_path=config['asr_train_acous_path'],
                acous_norm=config['las_acous_norm'],
                acous_norm_path=config['asr_train_acous_norm_path'],
                acous_max_len=config['las_acous_max_len'],
                data_ratio=config['asr_data_ratio'],
            )
            vocab_info['set'] = train_sets['asr']
        if config['asr_dev_path_src']:
            t.logger.info(' -- load ASR dev set -- ')
            dev_sets['asr'] = _mk(
                'ASR', path_src=config['asr_dev_path_src'],
                acous_path=config['asr_dev_acous_path'],
                acous_norm=config['las_acous_norm'],
                acous_norm_path=config['asr_dev_acous_norm_path'],
                acous_max_len=config['las_acous_max_len'],
            )

    if 'MT' in mode:
        if config['mt_train_path_src']:
            t.logger.info(' -- load MT train set -- ')
            train_sets['mt'] = _mk(
                'MT', path_src=config['mt_train_path_src'],
                path_tgt=config['mt_train_path_tgt'],
                acous_norm=config['las_acous_norm'],
                acous_max_len=config['las_acous_max_len'],
                data_ratio=config['mt_data_ratio'],
            )
            vocab_info['set'] = train_sets['mt']
        if config['mt_dev_path_src']:
            t.logger.info(' -- load MT dev set -- ')
            dev_sets['mt'] = _mk(
                'MT', path_src=config['mt_dev_path_src'],
                path_tgt=config['mt_dev_path_tgt'],
                acous_norm=config['las_acous_norm'],
                acous_max_len=config['las_acous_max_len'],
            )

    return train_sets, dev_sets, vocab_info['set']


def main():
    import numpy as np

    import jax
    import jax.numpy as jnp

    from stjep_tpu.models.seq2seq import init_seq2seq
    from stjep_tpu.train import trainer as trainer_mod
    from stjep_tpu.data.dataset import load_pretrained_embedding

    parser = argparse.ArgumentParser(description='LAS + NMT Training')
    parser = load_arguments(parser)
    args = vars(parser.parse_args())
    config = validate_config(args)

    if config['random_seed'] is not None:
        set_global_seeds(config['random_seed'])

    if not os.path.exists(config['save']):
        os.makedirs(config['save'])
    if config['load'] is not None and config['load_mode'] == 'resume':
        config_save_dir = os.path.join(config['save'], 'model-cont.cfg')
    else:
        config_save_dir = os.path.join(config['save'], 'model.cfg')
    save_config(config, config_save_dir)

    loss_coeff = {
        'nll_asr': config['loss_nll_asr_coeff'],
        'nll_mt': config['loss_nll_mt_coeff'],
        'nll_st': config['loss_nll_st_coeff'],
    }

    # trainer selected by mode (ref: train.py:162)
    Trainer = getattr(trainer_mod, 'Trainer_{}'.format(config['mode']))
    t = Trainer(
        expt_dir=config['save'], load_dir=config['load'],
        load_mode=config['load_mode'], load_freeze=config['load_freeze'],
        batch_size=config['batch_size'],
        minibatch_partition=config['minibatch_partition'],
        checkpoint_every=config['checkpoint_every'],
        print_every=config['print_every'],
        learning_rate=config['learning_rate'],
        learning_rate_init=config['learning_rate_init'],
        lr_warmup_steps=config['lr_warmup_steps'],
        eval_with_mask=config['eval_with_mask'],
        use_gpu=config['use_gpu'], gpu_id=config['gpu_id'],
        max_grad_norm=config['max_grad_norm'],
        max_count_no_improve=config['max_count_no_improve'],
        max_count_num_rollback=config['max_count_num_rollback'],
        keep_num=config['keep_num'], normalise_loss=config['normalise_loss'],
        loss_coeff=loss_coeff, seed=config['random_seed'],
        acous_bucket=config['acous_bucket'],
        n_model=config['n_model'],
        # feature staging dtype: 'auto' follows --dtype (bf16 halves the H2D
        # bytes of the dominant tensor, numerically free since the MXU reads
        # bf16 operands either way); 'int8' quarters them via per-utterance
        # scales + on-device dequant (stjep_tpu/data/device_cache.py)
        feat_dtype=(
            ('bfloat16' if config['dtype'] == 'bfloat16' else None)
            if config.get('feat_dtype', 'auto') in ('auto', None)
            else (None if config['feat_dtype'] == 'float32'
                  else config['feat_dtype'])),
        # 'auto' survives validate_config's string-bool normalisation;
        # True/False arrive as real bools (Trainer accepts all three)
        device_cache=config.get('device_cache', 'auto'),
        train_window=int(config.get('train_window', 1) or 1),
    )

    train_sets, dev_sets, vocab_set = build_datasets(config, t)

    dtype = jnp.bfloat16 if config['dtype'] == 'bfloat16' else jnp.float32
    cfg = ModelConfig(
        enc_vocab_size=len(vocab_set.vocab_src),
        dec_vocab_size=len(vocab_set.vocab_tgt),
        share_embedder=bool(config['share_embedder']),
        enc_embedding_size=config['embedding_size_enc'],
        dec_embedding_size=config['embedding_size_dec'],
        max_seq_len_src=config['max_seq_len_src'],
        max_seq_len_tgt=config['max_seq_len_tgt'],
        num_heads=config['num_heads'], dim_model=config['dim_model'],
        dim_feedforward=config['dim_feedforward'],
        enc_layers=config['enc_layers'], dec_layers=config['dec_layers'],
        embedding_dropout=config['embedding_dropout'],
        dropout=config['dropout'], act=bool(config['act']),
        transformer_type=config['transformer_type'],
        dec_emb_proj=bool(config['dec_emb_proj']),
        acous_dim=config['las_acous_dim'],
        acous_hidden_size=config['las_acous_hidden_size'],
        mode=config['mode'], load_mode=config['load_mode'],
        remat=bool(config['remat']),
    )
    params = init_seq2seq(jax.random.PRNGKey(config['random_seed'] or 0), cfg,
                          dtype=dtype)

    # pretrained embedding overlay (ref: models/Seq2seq.py:99-121)
    if config['load_embedding_src']:
        mat = np.asarray(params['enc_embedder'], dtype=np.float64)
        mat = load_pretrained_embedding(
            vocab_set.src_word2id, mat, config['load_embedding_src'])
        params['enc_embedder'] = jnp.asarray(mat, dtype=dtype)
    if config['load_embedding_tgt']:
        mat = np.asarray(params['dec_embedder'], dtype=np.float64)
        mat = load_pretrained_embedding(
            vocab_set.tgt_word2id, mat, config['load_embedding_tgt'])
        params['dec_embedder'] = jnp.asarray(mat, dtype=dtype)
    if cfg.share_embedder:
        # the reference rebinds enc_embedder = dec_embedder AFTER the
        # overlays (ref: Seq2seq.py:119-121): the tgt-side table wins and a
        # src-side overlay is discarded. The live (read) leaf in this
        # rebuild is enc_embedder (models/seq2seq._dec_embedder). jnp.copy:
        # distinct buffers, or the donating train step would donate one
        # buffer through two leaves.
        params['enc_embedder'] = jnp.copy(params['dec_embedder'])

    # average dynamic embedding artifact (explicit, ref: Seq2seq.py:64-66)
    if config.get('emb_dyn_ave'):
        params['emb_dyn_ave'] = jnp.asarray(
            np.load(config['emb_dyn_ave']).reshape(-1), dtype=dtype)

    from stjep_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()
    t.logger.info('devices: %s', jax.devices())
    t.train(train_sets, (cfg, params), num_epochs=config['num_epochs'],
            dev_sets=dev_sets, grab_memory=config['grab_memory'])


if __name__ == '__main__':
    main()
