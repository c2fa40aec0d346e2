"""Inference CLI — same flag surface as the reference (ref: translate.py:25-53).

Eval modes (ref: translate.py:443-459):
    1 - translate test set to <test_path_out>/translate.txt (beam search)
    2 - average checkpoints under --combine_path and save the combined model
    3 - gather mean dynamic embedding -> <test_path_out>/dyn_emb_ave.npy
        (the EMB_DYN_AVE artifact consumed by MT training / ST_BASE decode)
    4 - (extension) dump dynamic-vs-static embeddings to a TensorBoard
        projector (ref: translate.py:200-283 plot_emb)
"""

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

from stjep_tpu.config import ModelConfig, save_config, validate_config


def load_arguments(parser):
    """ref: translate.py:25-53 — flag names preserved."""
    parser.add_argument('--test_path_src', type=str, required=True, help='test src dir')
    parser.add_argument('--test_path_tgt', type=str, default='None', help='test tgt dir')
    parser.add_argument('--path_vocab_src', type=str, default='None', help='vocab src dir, no need')
    parser.add_argument('--path_vocab_tgt', type=str, default='None', help='vocab tgt dir, not needed')
    parser.add_argument('--use_type', type=str, default='char', help='use char | word level prediction')
    parser.add_argument('--acous_norm', type=str, default='False', help='input acoustic fbk normalisation')
    parser.add_argument('--acous_norm_path', type=str, default='None', help='acoustics norm')
    parser.add_argument('--test_acous_path', type=str, default='None', help='test set acoustics')

    parser.add_argument('--load', type=str, required=True, help='model load dir')
    parser.add_argument('--combine_path', type=str, default='None', help='combine multiple ckpts if given dir')
    parser.add_argument('--test_path_out', type=str, required=True, help='test out dir')

    parser.add_argument('--max_seq_len', type=int, default=32, help='maximum sequence length')
    parser.add_argument('--batch_size', type=int, default=64, help='batch size')
    parser.add_argument('--beam_width', type=int, default=0, help='beam width; set to 0 to disable beam search')
    parser.add_argument('--use_gpu', type=str, default='False', help='whether or not using GPU')
    parser.add_argument('--eval_mode', type=int, default=2, help='which evaluation mode to use')
    parser.add_argument('--gen_mode', type=str, default='ASR', help='AE|ASR|MT|ST[-REF|-HYP]')
    parser.add_argument('--lm_mode', type=str, default='null', help='null|s-4g|s-rnn|d')
    parser.add_argument('--seqrev', type=str, default=False, help='whether or not to reverse sequence')
    parser.add_argument('--lm_path', type=str, default='None',
        help='path to pickled n-gram LM (the reference hardcodes its LM dir, '
             'ref: translate.py:88-93). A .logscore object decodes via a '
             'host callback; a {"entries": {(ids...): logp}, "backoffs": '
             '{...}} dict builds an on-device hashed table (no host sync)')
    parser.add_argument('--beam_cache_dtype', type=str, default='float32',
        help='decode dtype: float32 (token-identical to the reference) | '
             'bfloat16 (~1.5x faster; the KV cache AND the staged acoustic '
             'features are bf16, so hypotheses may flip near-ties)')
    parser.add_argument('--weight_dtype', type=str, default='float32',
        choices=['float32', 'int8'],
        help='decoder weight-streaming dtype for the fused beam kernels: '
             'float32 (line-identical to the reference) | int8 (serving-'
             'latency mode — per-output-channel quantized weights quarter '
             'the per-step weight HBM reads that dominate small-batch '
             'decode; hypotheses may differ from the f32 oracle)')
    parser.add_argument('--feat_dtype', type=str, default='auto',
        choices=['auto', 'float32', 'bfloat16', 'int8'],
        help='acoustic-feature staging dtype: auto (follows '
             '--beam_cache_dtype) | float32 | bfloat16 | int8. int8 stages '
             'per-utterance-quantized features and dequantizes on device — '
             '4x fewer host->device bytes than f32 (the dominant transfer '
             'on bandwidth-limited hosts); quantization step is ~amax/127, '
             'far below the CMVN feature noise floor, but near-tie '
             'hypotheses may flip vs float32')
    return parser


def _load_model(load_dir):
    """Rebuild (cfg, params) from a checkpoint dir (model_config in meta)."""
    import jax

    from stjep_tpu.models.seq2seq import init_seq2seq
    from stjep_tpu.train.checkpoint import Checkpoint

    raw = Checkpoint.load(load_dir)
    assert raw.model_config is not None, (
        f"checkpoint at {load_dir} has no model_config metadata"
    )
    fields = {f.name for f in dataclasses.fields(ModelConfig)}
    cfg = ModelConfig(**{k: v for k, v in raw.model_config.items() if k in fields})
    template = init_seq2seq(jax.random.PRNGKey(0), cfg)
    try:
        ckpt = Checkpoint.load(load_dir, params_template=template)
        params = ckpt.params
    except Exception:
        # older checkpoint layout: overlay what matches, keep fresh values
        # for anything missing (the check_var analog, see upgrade_params)
        from stjep_tpu.train.checkpoint import upgrade_params

        params = upgrade_params(raw.params, template)
        ckpt = raw
    return cfg, params, ckpt


_FWD_CACHE: dict = {}


def translate(test_set, cfg, params, test_path_out, max_seq_len, beam_width,
              seqrev=False, gen_mode='ASR', lm_mode='null', lm_model=None,
              history='HYP', minibatch_size=None, logger_print=print,
              beam_cache_dtype='float32', feat_dtype='auto',
              weight_dtype='float32'):
    """MODE 1: beam-decode the test set to translate.txt
    (ref: translate.py:56-197)."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    from stjep_tpu.infer.forward import forward_translate
    from stjep_tpu.utils.misc import _convert_to_words_batchfirst, detok_words
    from stjep_tpu.ops.masks import round_up8

    beam_width = max(1, beam_width)
    refen = history == 'REF'
    # LAS decode length override at eval time (ref: translate.py:72-73)
    if 'ASR' in gen_mode or 'ST' in gen_mode:
        cfg = dataclasses.replace(cfg, max_seq_len_src=150)
    from stjep_tpu.infer.lm_fusion import make_ngram_fuser

    if isinstance(lm_model, dict) and "entries" in lm_model:
        # explicit ngram export {entries: {(ids...): logp}, backoffs: {...}}
        # -> on-device hashed probe table (no per-step host sync);
        # arbitrary .logscore objects keep the host-callback path
        from stjep_tpu.infer.lm_table import NGramTable, make_table_fuser

        table = NGramTable.from_ngrams(
            {tuple(k): v for k, v in lm_model["entries"].items()},
            {tuple(k): v for k, v in (lm_model.get("backoffs") or {}).items()},
        )
        lm_fuse = make_table_fuser(table, lm_mode)
    else:
        lm_fuse = make_ngram_fuser(lm_model, lm_mode)
    cache_dtype = jnp.bfloat16 if beam_cache_dtype == 'bfloat16' else None
    # resolve the feature staging dtype: 'auto' follows the decode dtype
    # (the pre-int8 behavior), so existing invocations are unchanged
    if feat_dtype in (None, 'auto'):
        feat_dtype = 'bfloat16' if cache_dtype is not None else 'float32'
    assert feat_dtype in ('float32', 'bfloat16', 'int8'), feat_dtype
    # cache the jitted decode across translate() calls: re-wrapping with
    # jax.jit discards the wrapper's trace cache, and RE-TRACING the beam
    # program costs seconds — a serving process that translates stream
    # after stream would pay it on every call (no-LM path only; lm_fuse
    # closures are not comparable)
    assert weight_dtype in ('float32', 'int8'), weight_dtype
    fwd_key = None
    if lm_fuse is None:
        fwd_key = (repr(cfg), gen_mode, beam_width, max_seq_len, refen,
                   beam_cache_dtype, feat_dtype, weight_dtype)
    fwd = _FWD_CACHE.get(fwd_key)
    if fwd is None:
        base = partial(
            forward_translate, cfg=cfg, mode=gen_mode, beam_width=beam_width,
            penalty_factor=1.0, max_seq_len=max_seq_len, refen=refen,
            lm_fuse=lm_fuse, cache_dtype=cache_dtype,
            weight_dtype=None if weight_dtype == 'float32' else weight_dtype,
        )
        if feat_dtype == 'int8':
            from stjep_tpu.data.device_cache import dequantize

            def _fwd_q(params, acous_q=None, acous_scale=None, **kw):
                # int8-staged features: dequantize on device (the first
                # consumer is the BiLSTM pyramid's MXU matmul)
                if acous_q is not None:
                    kw['acous_feats'] = dequantize(acous_q, acous_scale)
                return base(params, **kw)

            fwd = jax.jit(_fwd_q)
        else:
            fwd = jax.jit(base)
        if fwd_key is not None:
            _FWD_CACHE[fwd_key] = fwd

    test_set.construct_batches(is_train=False)
    os.makedirs(test_path_out, exist_ok=True)
    out_path = os.path.join(test_path_out, 'translate.txt')
    n_batches = len(test_set)
    logger_print('num batches: {}'.format(n_batches))

    def _stage(item):
        """Slice a macro batch into minibatches and place inputs on device.
        Runs on the prefetch thread so npy I/O and the H2D upload both
        overlap the decode of earlier minibatches."""
        B = item['srcid'].shape[0]
        mb = minibatch_size or B
        staged = []
        for st in range(0, B, mb):
            ed = min(st + mb, B)
            kwargs = {}
            if 'acous_feat' in item:
                from stjep_tpu.ops.masks import bucket_length

                alen = bucket_length(
                    int(round_up8(int(max(item['acouslen'][st:ed])))), 256)
                v = item['acous_feat'][st:ed]
                if alen > v.shape[1]:
                    v = np.pad(v, [(0, 0), (0, alen - v.shape[1]), (0, 0)])
                v = v[:, :alen]
                if feat_dtype == 'int8':
                    # quantize on the prefetch thread: 4x fewer H2D bytes
                    # than f32; dequantized on device inside the jitted
                    # decode (see _fwd_q above)
                    from stjep_tpu.data.device_cache import quantize_batch

                    import ml_dtypes
                    scale_dtype = (ml_dtypes.bfloat16
                                   if cache_dtype is not None else np.float32)
                    packed = quantize_batch(v, scale_dtype)
                    kwargs['acous_q'] = jnp.asarray(packed['q'])
                    kwargs['acous_scale'] = jnp.asarray(packed['scale'])
                else:
                    if feat_dtype == 'bfloat16':
                        # the user already opted into bf16 decode state; bf16
                        # feature staging halves the dominant H2D transfer
                        import ml_dtypes

                        v = v.astype(ml_dtypes.bfloat16)
                    kwargs['acous_feats'] = jnp.asarray(v)
                kwargs['acous_lens'] = jnp.asarray(item['acouslen'][st:ed])
            if gen_mode == 'MT' or refen:
                kwargs['src'] = jnp.asarray(item['srcid'][st:ed])
            staged.append(kwargs)
        return staged

    def _write(preds, f):
        if gen_mode == 'MT' or 'ST' in gen_mode:
            seqlist = preds[:, 1:]
            id2word = test_set.tgt_id2word
            use_type = 'char'
        else:  # ASR
            seqlist = preds
            id2word = test_set.src_id2word
            use_type = 'word'
        words = _convert_to_words_batchfirst(seqlist, id2word)
        for row in words:
            f.write('{}\n'.format(
                detok_words(row, use_type=use_type, seqrev=seqrev)))
        sys.stdout.flush()

    from collections import deque

    from stjep_tpu.data.loader import host_prefetch

    # software pipeline: keep DEPTH decodes in flight so batch staging,
    # device compute, the D2H readback, and host detok/writing all overlap
    # (a blocking per-minibatch readback serialised all four; on a
    # remote-attached device that alone costs a full RTT per minibatch)
    DEPTH = max(0, int(os.environ.get('STJEP_DECODE_PIPELINE', '4')))

    timing = os.environ.get('STJEP_TRANSLATE_TIMING') == '1'
    phase = {'materialise': 0.0, 'stage': 0.0, 'dispatch': 0.0,
             'drain': 0.0, 'write': 0.0}

    def _timed(key, fn, *a):
        if not timing:
            return fn(*a)
        t0 = time.perf_counter()
        out = fn(*a)
        phase[key] += time.perf_counter() - t0
        return out

    def _minibatches():
        for idx in range(n_batches):
            logger_print(idx + 1, n_batches)
            item = _timed('materialise', test_set.materialise_batch, idx)
            for kwargs in _timed('stage', _stage, item):
                yield kwargs

    # DEPTH=0: no prefetch thread, fully inline (diagnostic / single-core
    # hosts where the producer thread contends with dispatch)
    stream = (_minibatches() if DEPTH == 0
              else host_prefetch(_minibatches(), size=DEPTH))
    pending = deque()
    with open(out_path, 'w', encoding='utf8') as f:
        for kwargs in stream:
            pending.append(_timed('dispatch', lambda: fwd(params, **kwargs)))
            if len(pending) >= max(DEPTH, 1):
                time1 = time.time()
                preds = _timed('drain', np.asarray, pending.popleft())
                time2 = time.time()
                logger_print('comp time: ', time2 - time1)
                _timed('write', _write, preds, f)
        while pending:
            time1 = time.time()
            preds = _timed('drain', np.asarray, pending.popleft())
            logger_print('comp time: ', time.time() - time1)
            _timed('write', _write, preds, f)
    if timing:
        print('translate phases (s):',
              {k: round(v, 2) for k, v in phase.items()}, flush=True)
    return out_path


def gather_emb(test_set, cfg, params, test_path_out, logger_print=print):
    """MODE 3: mean dynamic embedding -> dyn_emb_ave.npy
    (ref: translate.py:286-357)."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    from stjep_tpu.models.seq2seq import _encoder_acous
    from stjep_tpu.ops.masks import round_up8

    @partial(jax.jit)
    def _dyn(params, acous_feats, acous_lens, src):
        emb, _, _, _ = _encoder_acous(
            params, cfg, acous_feats, acous_lens, tgt=src,
            is_training=False, teacher_forcing=True,
        )
        # mean over all token slots (ref: translate.py:351)
        return jnp.mean(emb.reshape(-1, emb.shape[-1]), axis=0)

    from stjep_tpu.ops.masks import bucket_length

    test_set.construct_batches(is_train=False)
    os.makedirs(test_path_out, exist_ok=True)
    lis = []
    for idx in range(len(test_set)):
        logger_print(idx + 1, len(test_set))
        item = test_set.materialise_batch(idx)
        alen = bucket_length(int(round_up8(int(max(item['acouslen'])))), 256)
        v = item['acous_feat']
        if alen > v.shape[1]:
            v = np.pad(v, [(0, 0), (0, alen - v.shape[1]), (0, 0)])
        # trim src to the batch's max length (the reference slices
        # src_ids[:, :src_len], ref: translate.py:122); bucket for XLA
        slen = min(bucket_length(int(max(item['srclen'])), 32),
                   item['srcid'].shape[1])
        vec = _dyn(params,
                   jnp.asarray(v[:, :alen]),
                   jnp.asarray(item['acouslen']),
                   jnp.asarray(item['srcid'][:, :slen]))
        lis.append(np.asarray(vec))
    emb_ave = np.mean(np.stack(lis, axis=0), axis=0)
    path_out = os.path.join(test_path_out, 'dyn_emb_ave.npy')
    np.save(path_out, emb_ave)
    logger_print('saved to {}'.format(path_out))
    return path_out


def plot_emb(test_set, cfg, params, test_path_out, logger_print=print):
    """MODE 4 (extension): TensorBoard projector dump of dynamic vs static
    embeddings (ref: translate.py:200-283)."""
    import jax.numpy as jnp

    from stjep_tpu.models.las_decoder import embed
    from stjep_tpu.models.seq2seq import _encoder_acous, _pre_proc_src
    from stjep_tpu.ops.masks import round_up8

    try:
        import torch
        from torch.utils.tensorboard import SummaryWriter
    except ImportError:
        logger_print('tensorboard unavailable; skipping plot_emb')
        return None

    writer = SummaryWriter(log_dir=test_path_out)
    test_set.construct_batches(is_train=False)
    item = test_set.materialise_batch(0)
    alen = int(round_up8(int(max(item['acouslen']))))
    alen = min(alen, item['acous_feat'].shape[1])
    dyn, _, preds, lengths = _encoder_acous(
        params, cfg, jnp.asarray(item['acous_feat'][:, :alen]),
        jnp.asarray(item['acouslen']), tgt=None, is_training=False,
        teacher_forcing=False, max_seq_len=cfg.max_seq_len_src,
    )
    src = _pre_proc_src(jnp.asarray(item['srcid']))
    static = embed(params['enc_embedder'], src)
    commlen = min(dyn.shape[1], static.shape[1])
    src_lens = np.asarray(item['srclen']) - 1
    mask = np.arange(commlen)[None, :] < src_lens[:, None]
    dyn_sel = np.asarray(dyn)[:, :commlen][mask]
    # static embeddings may be narrower than dynamic; project is for viz only
    stat_sel = np.asarray(static)[:, :commlen][mask]
    hyp_ids = np.asarray(preds)[:, :commlen][mask]
    ref_ids = np.asarray(src)[:, :commlen][mask]
    words = [test_set.src_id2word.get(int(i), '<unk>') for i in hyp_ids]
    words += [test_set.src_id2word.get(int(i), '<unk>') for i in ref_ids]
    if stat_sel.shape[1] != dyn_sel.shape[1]:
        pad = np.zeros((stat_sel.shape[0], dyn_sel.shape[1] - stat_sel.shape[1]))
        stat_sel = np.concatenate([stat_sel, pad], axis=1)
    feats = torch.tensor(np.concatenate([dyn_sel, stat_sel], axis=0))
    writer.add_embedding(feats, metadata=words)
    writer.close()
    logger_print('embedding projector written to {}'.format(test_path_out))
    return test_path_out


def main():
    from stjep_tpu.data.dataset import Dataset
    from stjep_tpu.train.checkpoint import Checkpoint, combine_weights, log_ckpts

    parser = argparse.ArgumentParser(description='Evaluation')
    parser = load_arguments(parser)
    args = vars(parser.parse_args())
    config = validate_config(args)

    test_path_src = config['test_path_src']
    test_path_tgt = config['test_path_tgt'] or test_path_src
    test_path_out = config['test_path_out']
    test_acous_path = config['test_acous_path']

    MODE = config['eval_mode']
    if MODE != 2:
        os.makedirs(test_path_out, exist_ok=True)
        save_config(config, os.path.join(test_path_out, 'eval.cfg'))

    from stjep_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()
    cfg, params, ckpt = _load_model(config['load'])
    print('Model dir: {}'.format(config['load']))
    print('Model loaded')

    if config['combine_path'] is not None:
        params = combine_weights(config['combine_path'], params_template=params)

    # long-decode support: the positional tables are pure functions of
    # max_time in this framework (ref: translate.py:70-77 expand_time)
    test_set = Dataset(
        path_src=test_path_src, path_tgt=test_path_tgt,
        vocab_src_list=ckpt.input_vocab, vocab_tgt_list=ckpt.output_vocab,
        use_type=config['use_type'],
        acous_path=test_acous_path,
        seqrev=config['seqrev'],
        acous_norm=config['acous_norm'],
        acous_norm_path=config['acous_norm_path'],
        acous_max_len=6000, max_seq_len_src=900, max_seq_len_tgt=900,
        batch_size=config['batch_size'],
        mode='ST' if test_acous_path else 'MT',
    )
    print('Test dir: {}'.format(test_path_src))
    print('Testset loaded')
    sys.stdout.flush()

    # '{AE|ASR|MT|ST}-{REF|HYP}' (ref: translate.py:431-437)
    parts = config['gen_mode'].split('-')
    gen_mode = parts[0]
    history = parts[1] if len(parts) == 2 else 'HYP'

    lm_model = None
    lm_mode = config['lm_mode']
    if lm_mode != 'null' and lm_mode is not None:
        if lm_mode.split('_')[0] != 's-4g':
            # fail loudly like the reference (assert False for s-rnn,
            # ref: translate.py:94-96); silently decoding with NO fusion
            # would misattribute the scores to the requested LM
            raise NotImplementedError(
                f"lm_mode {lm_mode!r}: only 'null' and 's-4g[_alpha]' are "
                "supported (the reference's s-rnn/d branches are "
                "non-functional too)")
        import dill

        assert config['lm_path'] is not None, '--lm_path required for s-4g'
        with open(config['lm_path'], 'rb') as fin:
            lm_model = dill.load(fin)
        print('LM {} - {} loaded'.format(lm_mode, config['lm_path']))

    if MODE == 1:
        translate(test_set, cfg, params, test_path_out,
                  config['max_seq_len'], config['beam_width'],
                  seqrev=config['seqrev'], gen_mode=gen_mode,
                  lm_mode=lm_mode, lm_model=lm_model, history=history,
                  beam_cache_dtype=config['beam_cache_dtype'],
                  feat_dtype=config.get('feat_dtype', 'auto'),
                  weight_dtype=config.get('weight_dtype', 'float32'))
    elif MODE == 2:
        assert config['combine_path'], (
            "--eval_mode 2 (checkpoint combine/average) requires "
            "--combine_path <dir of checkpoints>")
        out = Checkpoint(
            params=params, opt_state=None, epoch=0, step=0,
            input_vocab=test_set.vocab_src, output_vocab=test_set.vocab_tgt,
            model_config=ckpt.model_config,
        )
        # rstrip, not strip: the reference's strip('/') turns absolute paths
        # relative (ref: translate.py:454) — fixed here, noted in PARITY.md
        saved_path = out.save_customise(os.path.join(
            config['combine_path'].rstrip('/') + '-combine', 'combine'))
        log_ckpts(config['combine_path'],
                  config['combine_path'].rstrip('/') + '-combine')
        print('saving at {} ... '.format(saved_path))
    elif MODE == 3:
        gather_emb(test_set, cfg, params, test_path_out)
    elif MODE == 4:
        plot_emb(test_set, cfg, params, test_path_out)


if __name__ == '__main__':
    main()
