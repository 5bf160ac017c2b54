"""CLI options, flag-compatible with the reference recipes.

Parity: ``fairseq/options.py`` two-pass parsing (parse --task/--arch first,
add their args, re-parse, apply arch defaults) and the flag names used by
``examples/s2s_trans/run_baseline.sh`` / ``run_pretraining.sh`` /
``run_mix_tuning.sh`` — so existing recipes drive this framework unchanged
(modulo the binary name).
"""

from __future__ import annotations

import argparse
from typing import Any, List, Optional, Tuple

from .registry import (ARCH_REGISTRY, TASK_REGISTRY, import_user_module,
                       populate_builtin, register_arch)


def _str2bool(v: str) -> bool:
    return str(v).lower() in ("true", "1", "yes", "y")


def add_common_args(parser: argparse.ArgumentParser):
    p = parser.add_argument_group("common")
    p.add_argument("data", help="feature manifest root (TSVs + config.yaml)")
    p.add_argument("--user-dir", default=None)
    p.add_argument("--task", default="s2s_translation")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--log-format", default="simple",
                   choices=["simple", "json", "tqdm"])
    p.add_argument("--log-interval", type=int, default=100)
    p.add_argument("--log-file", default=None)
    p.add_argument("--tensorboard-logdir", default=None)
    p.add_argument("--wandb-project", default=None,
                   help="Weights & Biases project (library-gated sink)")
    p.add_argument("--wandb-run-name", default=None)
    p.add_argument("--azureml-logging", action="store_true",
                   help="log metrics to the AzureML run context")
    p.add_argument("--fp16", action="store_true",
                   help="mixed precision; maps to bfloat16 on TPU")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--config-yaml", default="config.yaml")
    p.add_argument("--num-workers", type=int, default=1,
                   help="collate worker threads (>1 overlaps wav/zip IO + "
                        "fbank across batches; DataLoader workers parity)")
    p.add_argument("--max-tokens", type=int, default=40000)
    p.add_argument("--batch-size", "--max-sentences", type=int, default=None)
    p.add_argument("--skip-invalid-size-inputs-valid-test",
                   action="store_true")
    p.add_argument("--required-batch-size-multiple", type=int, default=8)
    p.add_argument("--num-batch-buckets", type=int, default=0,
                   help="if >0, replace the iterator's default geometric "
                        "static-shape grid with N length-quantile buckets "
                        "for the padded time dims (reference "
                        "fairseq/tasks/translation.py:218 + "
                        "data_utils.get_buckets; the reference force-enables "
                        "this on TPU, audio_pretraining.py:158 — here "
                        "static shapes are always on, this controls the "
                        "menu size)")


def add_task_args(parser: argparse.ArgumentParser):
    p = parser.add_argument_group("task")
    p.add_argument("--train-subset", default="train")
    p.add_argument("--valid-subset", default="valid")
    p.add_argument("--gen-subset", default="test")
    p.add_argument("--n-frames-per-step", type=int, default=1)
    p.add_argument("--max-source-positions", type=int, default=3000)
    p.add_argument("--max-target-positions", type=int, default=2400)
    p.add_argument("--use-hubert", type=_str2bool, default=False)
    p.add_argument("--load-pretrained-hubert-from", default=None)
    p.add_argument("--hubert-hidden", type=int, default=768)
    p.add_argument("--hubert-layers", type=int, default=12)
    p.add_argument("--hubert-ffn", type=int, default=3072)
    p.add_argument("--hubert-heads", type=int, default=12)
    p.add_argument("--load-pretrained-encoder-from", default=None)
    p.add_argument("--load-pretrained-decoder-from", default=None)
    p.add_argument("--speaker-to-id", default=None,
                   help='JSON dict, e.g. \'{"fisher_spanish":0}\'')
    p.add_argument("--eval-inference", action="store_true")
    p.add_argument("--eval-args", default="{}")
    p.add_argument("--vocoder", default="griffin_lim")
    p.add_argument("--spec-bwd-max-iter", type=int, default=8)
    p.add_argument("--input-feat-per-channel", type=int, default=80)
    # dummy_s2st benchmark task knobs (fairseq/benchmark parity)
    p.add_argument("--dummy-items", type=int, default=256)
    p.add_argument("--dummy-src-frames", type=int, default=1200)
    p.add_argument("--dummy-tgt-frames", type=int, default=960)
    p.add_argument("--dummy-vocab", type=int, default=100)
    # dummy_lm / dummy_mt / dummy_masked_lm knobs
    p.add_argument("--dict-size", type=int, default=49996)
    p.add_argument("--dataset-size", type=int, default=100000)
    p.add_argument("--src-length", type=int, default=30)
    p.add_argument("--tgt-length", type=int, default=30)
    # text translation / LM tasks (fairseq/tasks/translation.py config)
    p.add_argument("--source-lang", "-s", default=None)
    p.add_argument("--target-lang", "-t", default=None)
    p.add_argument("--left-pad-source", type=_str2bool, default=True)
    p.add_argument("--left-pad-target", type=_str2bool, default=False)
    p.add_argument("--truncate-source", action="store_true",
                   help="truncate source to max-source-positions "
                   "(translation.py:88 TruncateDataset wrap)")
    p.add_argument("--dataset-impl", default=None,
                   choices=[None, "raw", "cached", "lazy", "mmap", "fasta",
                            "huffman"])
    # language_modeling task (fairseq/tasks/language_modeling.py config)
    # legacy_masked_lm task (fairseq/tasks/legacy_masked_lm.py add_args +
    # criterions/legacy_masked_lm.py add_args)
    p.add_argument("--break-mode", default="doc",
                   help="BlockPairDataset mode: doc | none")
    p.add_argument("--shuffle-dataset", action="store_true", default=False)
    p.add_argument("--masked-lm-only", action="store_true", default=False,
                   help="compute MLM loss only (skip the NSP term)")
    p.add_argument("--nsp-loss-weight", type=float, default=1.0,
                   help="weight for the next-sentence-prediction loss")
    p.add_argument("--sample-break-mode", default="none",
                   choices=["none", "complete", "complete_doc", "eos"])
    p.add_argument("--tokens-per-sample", type=int, default=1024)
    p.add_argument("--add-bos-token", action="store_true")
    # masked_lm task (fairseq/tasks/masked_lm.py config;
    # --mask-prob is shared with the wav2vec2 group)
    p.add_argument("--leave-unmasked-prob", type=float, default=0.1)
    p.add_argument("--random-token-prob", type=float, default=0.1)
    p.add_argument("--untie-weights-roberta", action="store_true")
    # sentence_prediction task (fairseq/tasks/sentence_prediction.py)
    p.add_argument("--num-classes", type=int, default=-1)
    # sentence_ranking task (fairseq/tasks/sentence_ranking.py add_args)
    p.add_argument("--init-token", type=int, default=None)
    p.add_argument("--separator-token", type=int, default=None)
    p.add_argument("--max-option-length", type=int, default=None)
    p.add_argument("--ranking-head-name",
                   default="sentence_classification_head")
    p.add_argument("--save-predictions", default=None)
    # masked_lm (XLM/BERT) model + cross_lingual_lm task
    p.add_argument("--monolingual-langs", default="en",
                   help="cross_lingual_lm: comma-separated languages")
    p.add_argument("--num-segment", type=int, default=2)
    p.add_argument("--sent-loss", action="store_true")
    p.add_argument("--sentence-class-num", type=int, default=2)
    p.add_argument("--share-encoder-input-output-embed",
                   action="store_true")
    p.add_argument("--pooler-activation-fn", default="tanh")
    p.add_argument("--apply-bert-init", action="store_true")
    # translation_from_pretrained_{bart,xlm}
    p.add_argument("--langs", default=None,
                   help="mBART pretraining languages ([lang] symbols)")
    p.add_argument("--prepend-bos", action="store_true")
    p.add_argument("--pretrained-xlm-checkpoint", default=None)
    p.add_argument("--init-encoder-only", action="store_true")
    p.add_argument("--init-decoder-only", action="store_true")
    # fconv_self_att (models/fconv_self_att.py add_args :72-110); the
    # bool-EXPR flags accept "True" / "[True] + [False]*5" strings
    p.add_argument("--self-attention", default="False")
    p.add_argument("--encoder-attention", default="False")
    p.add_argument("--multihead-attention-nheads", type=int, default=1)
    p.add_argument("--multihead-self-attention-nheads", type=int,
                   default=1)
    p.add_argument("--encoder-attention-nheads", type=int, default=1)
    p.add_argument("--project-input", default="False")
    p.add_argument("--gated-attention", default="False")
    p.add_argument("--downsample", default="False")
    p.add_argument("--pretrained", default="False")
    p.add_argument("--pretrained-checkpoint", default="")
    # multilingual_denoising / multilingual_masked_lm
    p.add_argument("--add-lang-token", action="store_true")
    p.add_argument("--multilang-sampling-alpha", type=float, default=1.0)
    # semisupervised_translation (tasks/semisupervised_translation.py)
    p.add_argument("--lambda-parallel-config", default="1.0")
    p.add_argument("--lambda-denoising-config", default="0.0")
    p.add_argument("--lambda-otf-bt-config", default="0.0")
    p.add_argument("--bt-max-len-a", type=float, default=1.1)
    p.add_argument("--bt-max-len-b", type=float, default=10.0)
    p.add_argument("--bt-beam-size", type=int, default=1)
    p.add_argument("--max-word-shuffle-distance", type=float, default=3.0)
    # online_backtranslation
    p.add_argument("--mono-langs", default=None)
    p.add_argument("--valid-lang-pairs", default=None)
    p.add_argument("--lambda-bt", default="1.0")
    p.add_argument("--lambda-dae", default="1.0")
    # validation-time BLEU (translation task TranslationConfig eval_bleu*)
    p.add_argument("--eval-bleu", action="store_true")
    p.add_argument("--eval-bleu-args", default="{}",
                   help='json generation args, e.g. {"beam": 4}')
    p.add_argument("--eval-bleu-detok", default="space")
    p.add_argument("--eval-bleu-detok-args", default="{}")
    p.add_argument("--eval-bleu-remove-bpe", default=None, nargs="?",
                   const="@@ ")
    p.add_argument("--eval-bleu-print-samples", action="store_true")
    p.add_argument("--word-dropout-prob", type=float, default=0.1)
    p.add_argument("--word-blanking-prob", type=float, default=0.2)
    p.add_argument("--pooler-dropout", type=float, default=0.0)
    # denoising task (fairseq/tasks/denoising.py; BART pretraining)
    p.add_argument("--mask", type=float, default=0.0)
    p.add_argument("--mask-random", type=float, default=0.0)
    p.add_argument("--insert", type=float, default=0.0)
    p.add_argument("--rotate", type=float, default=0.5)
    p.add_argument("--permute-sentences", type=float, default=0.0)
    p.add_argument("--poisson-lambda", type=float, default=3.0)
    # --mask-length is shared with the wav2vec2 group (int there,
    # subword/span-poisson here) — declared once as str in that group
    p.add_argument("--replace-length", type=int, default=-1)
    # translation_lev task (fairseq/tasks/translation_lev.py config)
    p.add_argument("--noise", default="random_delete",
                   choices=["random_delete", "random_mask", "no_noise",
                            "full_mask"])
    # translation_multi_simple_epoch task
    p.add_argument("--lang-pairs", default=None,
                   help="comma-separated, e.g. de-en,fr-en")
    p.add_argument("--encoder-langtok", default=None,
                   choices=[None, "src", "tgt"])
    p.add_argument("--decoder-langtok", action="store_true")
    p.add_argument("--sampling-temperature", type=float, default=1.0)
    # multilingual_transformer sharing (multilingual_transformer.py:44-67)
    p.add_argument("--share-encoder-embeddings", action="store_true")
    p.add_argument("--share-decoder-embeddings", action="store_true")
    p.add_argument("--share-encoders", action="store_true")
    p.add_argument("--share-decoders", action="store_true")


def add_model_args(parser: argparse.ArgumentParser):
    p = parser.add_argument_group("model")
    p.add_argument("--arch", default="s2st_transformer")
    # quantization (fairseq transformer_config.py QuantNoiseConfig +
    # dataclass/configs.py CommonConfig.quantization_config_path)
    p.add_argument("--quant-noise-pq", type=float, default=0.0,
                   help="iterative PQ quantization noise at training time")
    p.add_argument("--quant-noise-pq-block-size", type=int, default=8,
                   help="block size of quantization noise at training time")
    p.add_argument("--quant-noise-scalar", type=float, default=0.0,
                   help="scalar quantization noise and scalar quantization "
                        "at training time")
    p.add_argument("--quantization-config-path", default=None,
                   help="path to the iPQ yaml config (layers_to_quantize + "
                        "block_sizes/n_centroids); enables iterative product "
                        "quantization over the training run")
    p.add_argument("--encoder-layers", type=int, default=12)
    p.add_argument("--encoder-embed-dim", type=int, default=512)
    p.add_argument("--encoder-ffn-embed-dim", type=int, default=2048)
    p.add_argument("--encoder-attention-heads", type=int, default=4)
    p.add_argument("--encoder-normalize-before", action="store_true")
    p.add_argument("--decoder-layers", type=int, default=6)
    p.add_argument("--decoder-embed-dim", type=int, default=512)
    p.add_argument("--decoder-ffn-embed-dim", type=int, default=2048)
    p.add_argument("--decoder-attention-heads", type=int, default=4)
    p.add_argument("--decoder-normalize-before", action="store_true")
    p.add_argument("--conv-kernel-sizes", default="5,5")
    p.add_argument("--conv-channels", type=int, default=1024)
    p.add_argument("--middle-layers", default="6",
                   help="comma-separated encoder tap layers")
    p.add_argument("--middle-layers-decoder", default="",
                   help="MTL: comma-separated decoder tap layers")
    p.add_argument("--prenet-layers", type=int, default=2)
    p.add_argument("--prenet-dim", type=int, default=256)
    p.add_argument("--prenet-dropout", type=float, default=0.5)
    p.add_argument("--postnet-layers", type=int, default=5)
    p.add_argument("--postnet-conv-dim", type=int, default=512)
    p.add_argument("--postnet-conv-kernel-size", type=int, default=5)
    p.add_argument("--postnet-dropout", type=float, default=0.5)
    p.add_argument("--output-frame-dim", type=int, default=80)
    p.add_argument("--asr-decoder-layers", type=int, default=6)
    p.add_argument("--asr-decoder-embed-dim", type=int, default=256)
    p.add_argument("--st-decoder-layers", type=int, default=6)
    p.add_argument("--st-decoder-embed-dim", type=int, default=256)
    p.add_argument("--speaker-embed-dim", type=int, default=64)
    # t2s text-encoder knobs (t2s_transformer.py arch args)
    p.add_argument("--encoder-conv-layers", type=int, default=3)
    p.add_argument("--encoder-conv-kernel-size", type=int, default=5)
    p.add_argument("--encoder-dropout", type=float, default=0.5)
    p.add_argument("--encoder-transformer-layers", type=int, default=6)
    # Tacotron2 (models/text_to_speech/tacotron2.py add_args :280-304)
    p.add_argument("--encoder-lstm-layers", type=int, default=1)
    p.add_argument("--attention-dim", type=int, default=128)
    p.add_argument("--attention-conv-dim", type=int, default=32)
    p.add_argument("--attention-conv-kernel-size", type=int, default=15)
    p.add_argument("--init-attn-c", default="zero", choices=["zero", "avg"])
    p.add_argument("--attention-use-cumprob", action="store_true",
                   default=True)
    p.add_argument("--zoneout", type=float, default=0.1)
    p.add_argument("--decoder-lstm-layers", type=int, default=2)
    p.add_argument("--decoder-lstm-dim", type=int, default=1024)
    # s2t criterion target selection (s2t_loss.py:88-94)
    p.add_argument("--test-type", default="st", choices=["st", "asr"])
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--attention-dropout", type=float, default=0.1)
    p.add_argument("--activation-dropout", type=float, default=0.01)
    p.add_argument("--encoder-layerdrop", type=float, default=0.0,
                   help="LayerDrop probability per encoder layer "
                        "(arXiv 1909.11556; select-based under jit)")
    # FastSpeech2 (fastspeech2.py:351-375 base_architecture)
    p.add_argument("--fft-hidden-dim", type=int, default=1024)
    p.add_argument("--fft-kernel-size", type=int, default=9)
    p.add_argument("--var-pred-n-bins", type=int, default=256)
    p.add_argument("--var-pred-hidden-dim", type=int, default=256)
    p.add_argument("--var-pred-kernel-size", type=int, default=3)
    p.add_argument("--var-pred-dropout", type=float, default=0.5)
    p.add_argument("--pitch-min", type=float, default=0.0)
    p.add_argument("--pitch-max", type=float, default=600.0)
    p.add_argument("--energy-min", type=float, default=0.0)
    p.add_argument("--energy-max", type=float, default=5.0)
    p.add_argument("--add-postnet", action="store_true",
                   help="FastSpeech2: refine mel with a postnet")
    p.add_argument("--activation-fn", default="relu")
    p.add_argument("--no-scale-embedding", action="store_true")
    # text transformer family (fairseq/models/transformer flags)
    p.add_argument("--share-decoder-input-output-embed", action="store_true")
    p.add_argument("--share-all-embeddings", action="store_true")
    p.add_argument("--layernorm-embedding", action="store_true")
    p.add_argument("--no-decoder-final-norm", action="store_true")
    p.add_argument("--encoder-learned-pos", action="store_true")
    p.add_argument("--decoder-learned-pos", action="store_true")
    # NAT family (fairseq/models/nat special arguments)
    p.add_argument("--sg-length-pred", action="store_true")
    p.add_argument("--pred-length-offset", action="store_true")
    p.add_argument("--length-loss-factor", type=float, default=0.1)
    p.add_argument("--src-embedding-copy", action="store_true")
    # NAT-CRF special arguments (nacrf_transformer)
    p.add_argument("--crf-lowrank-approx", type=int, default=32)
    p.add_argument("--crf-beam-approx", type=int, default=64)
    p.add_argument("--word-ins-loss-factor", type=float, default=0.5)
    # iterative NAT special arguments
    p.add_argument("--train-step", type=int, default=4,
                   help="iNAT refinement iterations during training")
    p.add_argument("--dae-ratio", type=float, default=0.5)
    p.add_argument("--stochastic-approx", action="store_true")
    # levenshtein_transformer special arguments
    p.add_argument("--early-exit", default="6,6,6",
                   help="decoder layers before word_del, mask_ins, word_ins")
    p.add_argument("--no-share-discriminator", action="store_true")
    p.add_argument("--no-share-maskpredictor", action="store_true")
    p.add_argument("--share-discriminator-maskpredictor",
                   action="store_true")
    p.add_argument("--sampling-for-deletion", action="store_true")
    p.add_argument("--label-tau", type=float, default=None,
                   help="insertion transformer balanced-tree label "
                        "temperature")
    # lightconv/dynamicconv family (fairseq/models/lightconv.py flags)
    p.add_argument("--encoder-conv-dim", type=int, default=None)
    p.add_argument("--decoder-conv-dim", type=int, default=None)
    p.add_argument("--encoder-glu", type=_str2bool, default=True)
    p.add_argument("--decoder-glu", type=_str2bool, default=True)
    p.add_argument("--encoder-conv-type", default="lightweight",
                   choices=["lightweight", "dynamic"])
    p.add_argument("--decoder-conv-type", default="lightweight",
                   choices=["lightweight", "dynamic"])
    p.add_argument("--weight-softmax", type=_str2bool, default=True)
    p.add_argument("--weight-dropout", type=float, default=None)
    p.add_argument("--input-dropout", type=float, default=0.1)
    p.add_argument("--relu-dropout", type=float, default=0.0)
    p.add_argument("--encoder-kernel-size-list", default=None,
                   help="comma-separated per-layer kernel sizes")
    p.add_argument("--decoder-kernel-size-list", default=None)
    # adaptive input/softmax (transformer_lm wiki103/gbw archs)
    p.add_argument("--adaptive-input", type=_str2bool, default=False)
    p.add_argument("--adaptive-input-factor", type=float, default=4.0)
    p.add_argument("--adaptive-input-cutoff", default=None,
                   help="comma-separated, e.g. 20000,60000")
    p.add_argument("--adaptive-softmax-cutoff", default=None)
    p.add_argument("--adaptive-softmax-factor", type=float, default=4.0)
    p.add_argument("--adaptive-softmax-dropout", type=float, default=0.0)
    p.add_argument("--tie-adaptive-weights", type=_str2bool, default=False)
    p.add_argument("--tie-adaptive-proj", type=_str2bool, default=False)
    # lstm family (fairseq/models/lstm.py flags)
    p.add_argument("--encoder-hidden-size", type=int, default=None)
    p.add_argument("--encoder-bidirectional", type=_str2bool, default=False)
    p.add_argument("--encoder-dropout-in", type=float, default=None)
    p.add_argument("--encoder-dropout-out", type=float, default=None)
    p.add_argument("--decoder-hidden-size", type=int, default=None)
    p.add_argument("--decoder-out-embed-dim", type=int, default=None)
    p.add_argument("--residuals", action="store_true",
                   help="lstm_lm: residuals between LSTM layers")
    # transformer_align (models/transformer_align.py add_args :27-37)
    p.add_argument("--alignment-heads", type=int, default=1)
    p.add_argument("--alignment-layer", type=int, default=4)
    p.add_argument("--full-context-alignment", action="store_true")
    p.add_argument("--alignment-lambda", type=float, default=0.05)
    p.add_argument("--load-alignments", action="store_true")
    p.add_argument("--decoder-attention", type=_str2bool, default=True)
    # fconv conv stacks ("[(512, 3)] * 20 + ..." grammar, fconv.py archs)
    p.add_argument("--encoder-conv-spec", default=None)
    p.add_argument("--decoder-conv-spec", default=None)
    p.add_argument("--decoder-dropout-in", type=float, default=None)
    p.add_argument("--decoder-dropout-out", type=float, default=None)
    p.add_argument("--checkpoint-activations", action="store_true",
                   help="remat each transformer layer")
    p.add_argument("--vocab-parallel-embed", action="store_true",
                   help="Megatron-style vocab-sharded aux-decoder embedding "
                        "tables (needs --tp-size > 1)")
    p.add_argument("--use-flash-attention", action="store_true",
                   help="Pallas flash-attention for full-sequence attention "
                        "(needs --attention-dropout 0). Measured SLOWER at "
                        "both tested operating points on v5e (enc T~300: "
                        "103 vs 65 ms; T~600: 110 vs 78 ms — gap narrowing "
                        "with length but no crossover in this model's "
                        "range; ROADMAP round-4 falsification). Kept as an "
                        "escape hatch for much longer contexts/memory "
                        "pressure.")


def add_wav2vec2_args(parser: argparse.ArgumentParser):
    """wav2vec 2.0 pretraining flags (Wav2Vec2Config, wav2vec2.py:36-230 +
    AudioPretrainingConfig, tasks/audio_pretraining.py:31-70 + criterion
    flags, wav2vec_criterion.py:20-34)."""
    p = parser.add_argument_group("wav2vec2")
    # task / data
    p.add_argument("--sample-rate", type=int, default=16000)
    p.add_argument("--max-sample-size", type=int, default=250000)
    p.add_argument("--min-sample-size", type=int, default=32000)
    p.add_argument("--normalize", action="store_true",
                   help="layer-normalize each (cropped) waveform")
    # model
    p.add_argument("--conv-feature-layers",
                   default="[(512,10,5)]+[(512,3,2)]*4+[(512,2,2)]*2",
                   help="python literal [(dim, kernel, stride), ...]")
    p.add_argument("--final-dim", type=int, default=256)
    p.add_argument("--logit-temp", type=float, default=0.1)
    p.add_argument("--quantize-targets", action="store_true")
    p.add_argument("--latent-vars", type=int, default=320)
    p.add_argument("--latent-groups", type=int, default=2)
    p.add_argument("--latent-dim", type=int, default=0)
    p.add_argument("--latent-temp", default="(2.0,0.5,0.999995)")
    p.add_argument("--mask-prob", type=float, default=0.65)
    p.add_argument("--mask-length", default="10", help="wav2vec2: span length (int); denoising: subword|span-poisson")
    p.add_argument("--num-negatives", type=int, default=100)
    p.add_argument("--cross-sample-negatives", type=int, default=0)
    p.add_argument("--dropout-input", type=float, default=0.1)
    p.add_argument("--dropout-features", type=float, default=0.1)
    p.add_argument("--feature-grad-mult", type=float, default=0.1)
    p.add_argument("--conv-pos", type=int, default=128)
    p.add_argument("--conv-pos-groups", type=int, default=16)
    p.add_argument("--layer-norm-first", action="store_true")
    # wav2vec v1 (models/wav2vec/wav2vec.py Wav2VecConfig)
    p.add_argument("--prediction-steps", type=int, default=12)
    p.add_argument("--conv-aggregator-layers", default=None,
                   help="wav2vec v1: python literal [(dim, k, stride)...]")
    p.add_argument("--balanced-classes", action="store_true")
    p.add_argument("--log-compression", action="store_true")
    p.add_argument("--vq-type", default="none",
                   choices=["none", "kmeans", "gumbel"])
    p.add_argument("--vq-vars", type=int, default=320)
    p.add_argument("--vq-groups", type=int, default=2)
    p.add_argument("--vq-dim", type=int, default=0)
    p.add_argument("--vq-gamma", type=float, default=0.25)
    # criterion
    p.add_argument("--infonce", action="store_true")
    p.add_argument("--loss-weights", default="0.1,10",
                   help="prob_ppl,features_pen weights")
    # HuBERT pretraining (HubertPretrainingConfig, tasks/
    # hubert_pretraining.py:36-107 + HubertConfig, models/hubert/
    # hubert.py:40-230 + HubertCriterionConfig, hubert_criterion.py:19-35)
    p.add_argument("--labels", default="km",
                   help="comma list of frame-label suffixes")
    p.add_argument("--label-dir", default=None,
                   help="dir of {split}.{label} + dict.{label}.txt "
                        "(default: --data)")
    p.add_argument("--label-rate", type=float, default=50.0)
    p.add_argument("--untie-final-proj", action="store_true")
    p.add_argument("--skip-masked", action="store_true")
    p.add_argument("--skip-nomask", action="store_true")
    p.add_argument("--pred-masked-weight", type=float, default=1.0)
    p.add_argument("--pred-nomask-weight", type=float, default=0.0)
    # CTC ASR fine-tuning (Wav2Vec2AsrConfig, wav2vec2_asr.py:40-160 +
    # CtcCriterionConfig, criterions/ctc.py:24-64 + AudioFinetuningConfig)
    p.add_argument("--w2v-path", default=None,
                   help="pretrained SSL trunk (.pt or our .npz)")
    p.add_argument("--final-dropout", type=float, default=0.0)
    p.add_argument("--apply-mask", action="store_true",
                   help="apply the SSL span mask during fine-tuning")
    p.add_argument("--mask-channel-prob", type=float, default=0.0)
    p.add_argument("--mask-channel-length", type=int, default=10)
    p.add_argument("--freeze-finetune-updates", type=int, default=0)
    p.add_argument("--blank-weight", type=float, default=0.0)
    p.add_argument("--blank-mode", default="add", choices=["add", "set"])
    p.add_argument("--no-zero-infinity", dest="zero_infinity",
                   action="store_false", default=True)


def add_criterion_args(parser: argparse.ArgumentParser):
    p = parser.add_argument_group("criterion")
    p.add_argument("--criterion", default="s2st_loss")
    p.add_argument("--bce-pos-weight", type=float, default=5.0)
    p.add_argument("--use-guided-attention-loss", action="store_true")
    p.add_argument("--guided-attention-loss-sigma", type=float, default=0.4)
    p.add_argument("--label-smoothing", type=float, default=0.0)
    p.add_argument("--ctc-weight", type=float, default=0.0)
    p.add_argument("--ctc-weight-tgt", type=float, default=0.0,
                   help="MTL: tgt CTC over a decoder middle-layer tap")
    p.add_argument("--asr-ce-weight", type=float, default=0.0)
    p.add_argument("--st-ce-weight", type=float, default=0.0)
    p.add_argument("--l1-loss-weight", type=float, default=1.0)
    p.add_argument("--mse-loss-weight", type=float, default=1.0)
    p.add_argument("--eos-loss-weight", type=float, default=1.0)
    p.add_argument("--attn-loss-weight", type=float, default=1.0)
    p.add_argument("--sentence-avg", action="store_true")
    p.add_argument("--report-accuracy", action="store_true")


def add_optimization_args(parser: argparse.ArgumentParser):
    p = parser.add_argument_group("optimization")
    p.add_argument("--optimizer", default="adam")
    p.add_argument("--adam-betas", default="(0.9, 0.98)")
    p.add_argument("--adam-eps", type=float, default=1e-8)
    p.add_argument("--adam-bf16-stats", action="store_true",
                   help="store adam moments in bfloat16 (the reference's "
                        "--fp16-adam-stats, fairseq/optim/adam.py; halves "
                        "optimizer-state HBM traffic)")
    p.add_argument("--weight-decay", type=float, default=0.0)
    p.add_argument("--lr", default="0.001")
    p.add_argument("--lr-scheduler", default="inverse_sqrt")
    p.add_argument("--epoch2lr", default="{}",
                   help='manual scheduler: epoch->lr dict, keys "5", "1,2" '
                        'or "3-10" (manual_lr_scheduler.py parity)')
    p.add_argument("--update2lr", default="{}",
                   help="manual scheduler: update->lr dict, same key syntax")
    p.add_argument("--warmup-updates", type=int, default=4000)
    p.add_argument("--warmup-init-lr", type=float, default=-1.0)
    p.add_argument("--lr-shrink", type=float, default=0.1,
                   help="reduce_lr_on_plateau shrink factor")
    p.add_argument("--clip-norm", type=float, default=0.0)
    p.add_argument("--max-update", type=int, default=0)
    p.add_argument("--max-epoch", type=int, default=0)
    p.add_argument("--update-freq", default="1")
    p.add_argument("--stop-min-lr", type=float, default=-1.0)
    p.add_argument("--find-unused-parameters", action="store_true")  # no-op


def add_checkpoint_args(parser: argparse.ArgumentParser):
    p = parser.add_argument_group("checkpoint")
    p.add_argument("--save-dir", default="checkpoints")
    p.add_argument("--restore-file", default="checkpoint_last.npz")
    p.add_argument("--reset-optimizer", action="store_true")
    p.add_argument("--reset-dataloader", action="store_true")
    p.add_argument("--save-interval", type=int, default=1)
    p.add_argument("--save-interval-updates", type=int, default=0,
                   help="also save every N updates (mid-epoch)")
    p.add_argument("--keep-interval-updates", type=int, default=-1,
                   help="keep the last N update checkpoints")
    p.add_argument("--keep-best-checkpoints", type=int, default=-1)
    p.add_argument("--keep-last-epochs", type=int, default=-1)
    p.add_argument("--no-save", action="store_true")
    p.add_argument("--write-checkpoints-asynchronously", "--save-async",
                   action="store_true",
                   help="fetch+write checkpoints in a background thread "
                        "(the training loop keeps dispatching; an on-device "
                        "snapshot protects against donated-buffer reuse)")
    p.add_argument("--no-epoch-checkpoints", action="store_true",
                   help="only store last/best checkpoints")
    p.add_argument("--best-checkpoint-metric", default="loss")
    p.add_argument("--maximize-best-checkpoint-metric", action="store_true")
    p.add_argument("--validate-after-updates", type=int, default=0)
    p.add_argument("--validate-interval", type=int, default=1)
    p.add_argument("--validate-interval-updates", type=int, default=0,
                   help="also validate every N updates (mid-epoch)")
    p.add_argument("--disable-validation", action="store_true")
    p.add_argument("--patience", type=int, default=-1)


def add_ema_and_diag_args(parser: argparse.ArgumentParser):
    p = parser.add_argument_group("ema/diagnostics")
    p.add_argument("--store-ema", action="store_true")
    p.add_argument("--ema-decay", type=float, default=0.9999)
    p.add_argument("--ema-start-update", type=int, default=0)
    p.add_argument("--ema-update-freq", type=int, default=1)
    p.add_argument("--heartbeat-timeout", type=float, default=-1.0,
                   help="SIGINT the job if no update completes in N seconds")
    p.add_argument("--profile", action="store_true",
                   help="write a jax.profiler trace for the first epoch")


def add_distributed_args(parser: argparse.ArgumentParser):
    p = parser.add_argument_group("distributed")
    p.add_argument("--dp-size", type=int, default=None,
                   help="data axis size (default: all devices)")
    p.add_argument("--fsdp-size", type=int, default=1,
                   help="parameter-sharding axis size")
    p.add_argument("--tp-size", type=int, default=1,
                   help="tensor-parallel axis size")
    p.add_argument("--prng-impl", default="rbg",
                   choices=["rbg", "threefry2x32", "unsafe_rbg"],
                   help="JAX PRNG implementation. rbg (XLA RngBitGenerator) "
                        "more than halves the train step vs threefry on TPU "
                        "(dropout mask generation: 167.6 -> 73.8 ms/step, "
                        "MFU 0.151 -> 0.314 measured on v5e); threefry2x32 "
                        "restores jax's default stable-across-versions "
                        "stream")
    p.add_argument("--pp-size", type=int, default=1,
                   help="pipeline-parallel stage axis size (reference "
                        "--pipeline-balance/-devices; GPipe over a stage "
                        "mesh axis here)")
    p.add_argument("--pipeline-chunks", type=int, default=1,
                   help="pipeline microbatches per step (GPipe chunks; "
                        "reference --pipeline-chunks)")
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() (env-configured "
                        "coordinator) before building the mesh")


def add_generation_args(parser: argparse.ArgumentParser):
    p = parser.add_argument_group("generation")
    p.add_argument("--path", required=True, help="checkpoint path(s), ':'-sep")
    p.add_argument("--results-path", default=None)
    p.add_argument("--model-overrides", default="{}",
                   help="python-dict literal of config keys to override "
                        "when rebuilding the model from the checkpoint's "
                        "embedded config (fairseq generate "
                        "--model-overrides)")
    p.add_argument("--max-iter", type=int, default=1500)
    p.add_argument("--eos-prob-threshold", type=float, default=0.5)
    p.add_argument("--duration-factor", type=float, default=1.0,
                   help="FastSpeech2: scale predicted durations (d_factor)")
    p.add_argument("--min-duration", type=int, default=0,
                   help="FastSpeech2: floor for predicted per-token "
                        "durations at inference (extension; 0 = reference "
                        "behavior)")
    p.add_argument("--kv-cache-dtype", default="bf16",
                   choices=["bf16", "int8"],
                   help="int8-quantize the decoder KV caches (per-token "
                        "per-head absmax): halves KV cache MEMORY for "
                        "long-utterance/large-batch serving; quality-"
                        "tested. NOT a speed knob on v5e — XLA's decode "
                        "attention is compute-bound, not bandwidth-bound "
                        "(measured; see ROADMAP perf notes)")
    p.add_argument("--teacher-forcing", action="store_true")
    p.add_argument("--dump-waveforms", action="store_true")
    p.add_argument("--dump-features", action="store_true")
    p.add_argument("--dump-attentions", action="store_true")
    p.add_argument("--dump-eos-probs", action="store_true")
    p.add_argument("--dump-plots", action="store_true")
    p.add_argument("--dump-target", action="store_true")
    p.add_argument("--output-sample-rate", type=int, default=16000)
    p.add_argument("--beam", type=int, default=5)
    p.add_argument("--lenpen", type=float, default=1.0)
    p.add_argument("--min-len", type=int, default=1)
    p.add_argument("--no-repeat-ngram-size", type=int, default=0)
    # search strategies (fairseq generation flags, dataclass/configs.py
    # GenerationConfig / options.add_generation_args)
    p.add_argument("--sampling", action="store_true",
                   help="sample hypotheses instead of beam search")
    p.add_argument("--sampling-topk", type=int, default=-1,
                   help="sample from the top-K most likely tokens")
    p.add_argument("--sampling-topp", type=float, default=-1.0,
                   help="sample from the smallest token set with cumulative "
                        "probability mass >= p")
    p.add_argument("--diverse-beam-groups", type=int, default=-1,
                   help="DiverseBeamSearch group count (-1 = off)")
    p.add_argument("--diverse-beam-strength", type=float, default=0.5)
    p.add_argument("--diversity-rate", type=float, default=-1.0,
                   help="DiverseSiblingsSearch rate (-1 = off)")
    p.add_argument("--prefix-size", type=int, default=0,
                   help="initialize generation with this many target tokens")
    p.add_argument("--constraints", choices=["ordered", "unordered"],
                   default=None,
                   help="lexically constrained decoding (fairseq "
                        "--constraints); needs --constraints-file")
    p.add_argument("--constraints-file", default=None,
                   help="TSV: <utt_id>\\t<phrase>\\t<phrase>... — phrases "
                        "are text encoded with the decoding dictionary "
                        "(the reference feeds constraints per input line; "
                        "a manifest-keyed file is this CLI's equivalent)")
    p.add_argument("--score-reference", action="store_true",
                   help="score the reference targets instead of decoding "
                        "(SequenceScorer)")
    # iterative refinement (fairseq IterativeRefinementGenerator flags)
    p.add_argument("--iter-decode-max-iter", type=int, default=10)
    p.add_argument("--iter-decode-eos-penalty", type=float, default=0.0)
    p.add_argument("--iter-decode-with-beam", type=int, default=1)
    p.add_argument("--iter-decode-force-max-iter", action="store_true")
    p.add_argument("--retain-iter-history", action="store_true")
    p.add_argument("--max-len-a", type=float, default=0.0,
                   help="text decode max length = a*src_len + b "
                        "(fairseq --max-len-a/b)")
    p.add_argument("--max-len-b", type=int, default=200)
    p.add_argument("--remove-bpe", "--post-process", dest="remove_bpe",
                   nargs="?", const="@@ ", default=None,
                   help="post-process hypotheses (e.g. '@@ ' or "
                        "'sentencepiece') before scoring")
    p.add_argument("--buffer-size", type=int, default=1,
                   help="interactive: read this many lines at a time")
    p.add_argument("--input", default="-",
                   help="interactive: input file (default stdin)")
    p.add_argument("--tokenizer", default=None,
                   choices=[None, "space", "moses", "nltk"])
    p.add_argument("--bpe", default=None,
                   choices=[None, "sentencepiece", "subword_nmt", "fastbpe",
                            "gpt2", "bytes", "byte_bpe", "characters",
                            "bert", "hf_byte_bpe"])
    p.add_argument("--nbest", type=int, default=1,
                   help="number of hypotheses to output per sample")
    p.add_argument("--scoring", default="sacrebleu")
    p.add_argument("--wer-tokenizer", default="none")
    p.add_argument("--wer-lowercase", action="store_true")
    p.add_argument("--wer-remove-punct", action="store_true")


# ---------------------------------------------------------------------------
# architectures (ARCH_CONFIG_REGISTRY parity)
# ---------------------------------------------------------------------------

@register_arch("s2st_transformer")
def s2st_transformer_base(args):
    """Reference base_architecture (s2st_transformer.py:792-830): defaults
    already match the add_model_args defaults."""
    return args


@register_arch("s2st_transformer_mtl")
def s2st_transformer_mtl(args):
    """MTL predecessor (s2st_transformer_mtl.py:410): encoder + decoder
    middle-layer taps with src+tgt CTC; no HuBERT, no aux text decoders."""
    if not getattr(args, "middle_layers_decoder", ""):
        args.middle_layers_decoder = "3"
    return args


@register_arch("tts_transformer")   # reference text_to_speech arch name
@register_arch("t2s_transformer")
def t2s_transformer_base(args):
    """t2s_transformer.py base arch: text encoder w/ conv prenet
    (= the reference's tts_transformer, models/text_to_speech/
    tts_transformer.py — the s2s_trans T2S decoder is the same module)."""
    return args


@register_arch("tacotron_2")
def tacotron_2_base(args):
    """fairseq/models/text_to_speech/tacotron2.py:325-350
    base_architecture: 512-dim conv+biLSTM encoder, 1024-dim zoneout
    LSTM decoder with location attention."""
    args.encoder_embed_dim = 512
    args.encoder_dropout = 0.5
    args.encoder_conv_layers = 3
    args.encoder_conv_kernel_size = 5
    return args


@register_arch("s2t_transformer")
def s2t_transformer_base(args):
    return args


@register_arch("fastspeech2")
def fastspeech2_base(args):
    """Non-autoregressive TTS (fairseq/models/text_to_speech/
    fastspeech2.py:351-375 base_architecture). Structural defaults differ
    from the s2st transformer's; explicit CLI flags still win
    (_two_pass's explicit-flag restore)."""
    args.encoder_layers = 4
    args.encoder_embed_dim = 256
    args.encoder_attention_heads = 2
    args.decoder_layers = 4
    args.decoder_embed_dim = 256
    args.decoder_attention_heads = 2
    args.dropout = 0.2
    args.attention_dropout = 0.0
    return args


@register_arch("wav2vec")
def wav2vec_v1_arch(args):
    """wav2vec v1 (models/wav2vec/wav2vec.py Wav2VecConfig defaults):
    5-block strided extractor, 9x(512,3,1) causal aggregator, 12-step
    CPC with 10 negatives, binary-CE objective."""
    if getattr(args, "conv_feature_layers", None) in (
            None, "[(512,10,5)]+[(512,3,2)]*4+[(512,2,2)]*2"):
        # the wav2vec2 default spec means "unset" here
        args.conv_feature_layers = \
            "[(512,10,5),(512,8,4),(512,4,2),(512,4,2),(512,4,2)]"
    return args


@register_arch("wav2vec2")
def wav2vec2_base(args):
    """wav2vec2 base arch (examples/wav2vec config wav2vec2_base_librispeech
    + Wav2Vec2Config defaults): 12x768 encoder, quantized targets, InfoNCE."""
    args.encoder_layers = 12
    args.encoder_embed_dim = 768
    args.encoder_ffn_embed_dim = 3072
    args.encoder_attention_heads = 12
    args.dropout = 0.1
    args.attention_dropout = 0.1
    args.activation_dropout = 0.0
    args.quantize_targets = True
    args.infonce = True
    return args


def conv_spec_expr(s):
    """Evaluate the reference's conv-spec syntax
    ("[(512,10,5)] + [(512,3,2)] * 4 + ...") without eval(): only
    list/tuple/int literals and +/* of lists are allowed."""
    import ast

    def ev(node):
        if isinstance(node, ast.Expression):
            return ev(node.body)
        if isinstance(node, (ast.List, ast.Tuple)):
            v = [ev(e) for e in node.elts]
            return v if isinstance(node, ast.List) else tuple(v)
        if isinstance(node, ast.Constant) and isinstance(node.value, int):
            return node.value
        if isinstance(node, ast.BinOp) and isinstance(node.op, ast.Add):
            return ev(node.left) + ev(node.right)
        if isinstance(node, ast.BinOp) and isinstance(node.op, ast.Mult):
            return ev(node.left) * ev(node.right)
        raise ValueError(f"bad conv spec element: {ast.dump(node)}")
    return ev(ast.parse(s, mode="eval"))


def build_wav2vec2_config(args):
    """args -> Wav2Vec2Config (+ HubertConfig trunk). The trunk reuses the
    shared encoder flag names (--encoder-layers etc.)."""
    import ast

    import jax.numpy as jnp
    from .models.hubert import HubertConfig
    from .models.wav2vec2 import Wav2Vec2Config

    _list_expr = conv_spec_expr

    conv = tuple(tuple(t) for t in _list_expr(str(args.conv_feature_layers)))
    trunk = HubertConfig(
        conv_layers=conv,
        encoder_layers=args.encoder_layers,
        encoder_embed_dim=args.encoder_embed_dim,
        encoder_ffn_embed_dim=args.encoder_ffn_embed_dim,
        encoder_attention_heads=args.encoder_attention_heads,
        conv_pos=args.conv_pos,
        conv_pos_groups=args.conv_pos_groups,
        layer_norm_first=getattr(args, "layer_norm_first", False),
        dtype=jnp.bfloat16 if (args.fp16 or args.bf16) else jnp.float32)
    return Wav2Vec2Config(
        trunk=trunk,
        final_dim=args.final_dim,
        logit_temp=args.logit_temp,
        quantize_targets=getattr(args, "quantize_targets", False),
        latent_vars=args.latent_vars,
        latent_groups=args.latent_groups,
        latent_dim=args.latent_dim,
        latent_temp=tuple(ast.literal_eval(str(args.latent_temp))),
        mask_prob=args.mask_prob,
        mask_length=int(args.mask_length),
        num_negatives=args.num_negatives,
        cross_sample_negatives=args.cross_sample_negatives,
        dropout=args.dropout,
        attention_dropout=args.attention_dropout,
        activation_dropout=args.activation_dropout,
        dropout_input=args.dropout_input,
        dropout_features=args.dropout_features,
        feature_grad_mult=args.feature_grad_mult,
        dtype=jnp.bfloat16 if (args.fp16 or args.bf16) else jnp.float32)


@register_arch("hubert")
def hubert_base(args):
    """HuBERT base pretraining arch (HubertConfig defaults, models/hubert/
    hubert.py:40-230 = the hubert_base_librispeech recipe): 12x768
    post-LN encoder over the 7-conv 512-d extractor."""
    args.encoder_layers = 12
    args.encoder_embed_dim = 768
    args.encoder_ffn_embed_dim = 3072
    args.encoder_attention_heads = 12
    args.dropout = 0.1
    args.attention_dropout = 0.1
    args.activation_dropout = 0.0
    args.mask_prob = 0.8           # HubertConfig default (hubert.py:96-99)
    args.loss_weights = "10"       # [features_pen] (base recipe yaml)
    return args


def build_hubert_pretrain_config(args, num_classes):
    """args -> models.hubert.HubertConfig with the pretraining fields
    (HubertModel.__init__, hubert.py:232-310)."""
    import jax.numpy as jnp
    from .options import build_wav2vec2_config  # conv-spec parser reuse
    w2v = build_wav2vec2_config(args)
    trunk = w2v.trunk
    import dataclasses
    return dataclasses.replace(
        trunk,
        label_rate=getattr(args, "label_rate", 50),
        sample_rate=getattr(args, "sample_rate", 16000),
        final_dim=args.final_dim,
        logit_temp=args.logit_temp,
        num_classes=tuple(num_classes),
        untie_final_proj=getattr(args, "untie_final_proj", False),
        skip_masked=getattr(args, "skip_masked", False),
        skip_nomask=getattr(args, "skip_nomask", False),
        feature_grad_mult=args.feature_grad_mult,
        mask_prob=args.mask_prob,
        mask_length=int(args.mask_length),
        dropout_input=args.dropout_input,
        dropout_features=args.dropout_features,
        dropout=args.dropout,
        activation_dropout=args.activation_dropout,
        dtype=jnp.bfloat16 if (args.fp16 or args.bf16) else jnp.float32)


@register_arch("wav2vec_ctc")
@register_arch("hubert_ctc")
def ssl_ctc_arch(args):
    """wav2vec_ctc / hubert_ctc fine-tuning archs (wav2vec2_asr.py /
    hubert_asr.py): the base 12x768 trunk + vocabulary projection. The
    two reference classes share every numeric; only checkpoint layout
    differs (handled in models/ctc_asr.load_w2v_trunk)."""
    args.encoder_layers = 12
    args.encoder_embed_dim = 768
    args.encoder_ffn_embed_dim = 3072
    args.encoder_attention_heads = 12
    args.dropout = 0.0
    args.attention_dropout = 0.0
    args.activation_dropout = 0.0
    args.dropout_input = 0.0
    args.dropout_features = 0.0
    args.feature_grad_mult = 0.0   # conv extractor frozen at fine-tune
    args.mask_prob = 0.65
    return args


def build_ctc_asr_config(args, vocab_size: int):
    """args -> models.ctc_asr.CtcAsrConfig (trunk reuses the shared
    encoder flags via build_wav2vec2_config)."""
    import jax.numpy as jnp
    from .models.ctc_asr import CtcAsrConfig
    # the pretrain builder fills the mask/dropout/grad-mult trunk fields
    trunk = build_hubert_pretrain_config(args, ())
    return CtcAsrConfig(
        trunk=trunk,
        vocab_size=vocab_size,
        final_dropout=getattr(args, "final_dropout", 0.0),
        apply_mask=getattr(args, "apply_mask", False),
        mask_channel_prob=getattr(args, "mask_channel_prob", 0.0),
        mask_channel_length=getattr(args, "mask_channel_length", 10),
        freeze_finetune_updates=getattr(args, "freeze_finetune_updates", 0),
        blank_weight=getattr(args, "blank_weight", 0.0),
        blank_mode=getattr(args, "blank_mode", "add"),
        dtype=jnp.bfloat16 if (args.fp16 or args.bf16) else jnp.float32)


@register_arch("xm_transformer")
def xm_transformer(args):
    """xm_transformer.py base arch: frozen wav2vec2 trunk + Conv1dAdaptor
    + mBART decoder (12 x 1024, pre-norm, learned pos)."""
    args.use_hubert = True       # raw-audio input pipeline
    args.decoder_layers = 12
    args.decoder_embed_dim = 1024
    args.decoder_ffn_embed_dim = 4096
    args.decoder_attention_heads = 16
    args.decoder_normalize_before = True
    args.activation_fn = "gelu"
    args.adaptor_n_layers = getattr(args, "adaptor_n_layers", 3)
    args.adaptor_kernel_size = getattr(args, "adaptor_kernel_size", 3)
    args.adaptor_stride = getattr(args, "adaptor_stride", 2)
    args.adaptor_layernorm = getattr(args, "adaptor_layernorm", False)
    return args


@register_arch("s2t_berard")
def s2t_berard(args):
    """berard.py:546-566: tanh MLP + conv pyramid + biLSTM encoder,
    MLP-attention LSTM decoder."""
    args.input_layers = getattr(args, "input_layers", "[256, 128]")
    args.conv_layers = getattr(args, "conv_layers",
                               "[(16, 3, 2), (16, 3, 2)]")
    args.num_blstm_layers = getattr(args, "num_blstm_layers", 3)
    args.lstm_size = getattr(args, "lstm_size", 256)
    args.dropout = 0.2
    args.decoder_embed_dim = 128
    args.decoder_num_layers = getattr(args, "decoder_num_layers", 2)
    args.decoder_hidden_dim = getattr(args, "decoder_hidden_dim", 512)
    args.attention_dim = getattr(args, "attention_dim", 512)
    args.output_layer_dim = getattr(args, "output_layer_dim", 128)
    return args


@register_arch("s2t_berard_256_3_3")
def s2t_berard_256_3_3(args):
    s2t_berard(args)
    args.decoder_num_layers = 3
    return args


@register_arch("convtransformer")
def convtransformer(args):
    """convtransformer.py:401-437 base arch: 2D-conv frontend S2T."""
    args.encoder_layers = 6
    args.encoder_embed_dim = 512
    args.encoder_ffn_embed_dim = 2048
    args.encoder_attention_heads = 8
    args.decoder_layers = 6
    args.decoder_embed_dim = 512
    args.decoder_ffn_embed_dim = 2048
    args.decoder_attention_heads = 8
    args.dropout = 0.1
    args.attention_dropout = 0.0
    args.activation_dropout = 0.0
    args.conv_out_channels = getattr(args, "conv_out_channels", 256)
    return args


@register_arch("convtransformer_espnet")
def convtransformer_espnet(args):
    convtransformer(args)
    args.encoder_layers = 12
    args.encoder_attention_heads = 4
    args.decoder_attention_heads = 4
    return args


@register_arch("s2t_transformer_hubert")
def s2t_transformer_hubert(args):
    """s2t_transformer_me.py:82 — S2T with the frozen HuBERT frontend
    (mix/prompt-tuning ST pretraining stage)."""
    args.use_hubert = True
    return args


def _transformer_text_base(args):
    """fairseq transformer base_architecture (models/transformer/
    transformer_legacy.py:169-221). The shared model-group defaults are the
    speech recipe's; the text archs pin every differing structural field."""
    args.encoder_layers = 6
    args.encoder_embed_dim = 512
    args.encoder_ffn_embed_dim = 2048
    args.encoder_attention_heads = 8
    args.decoder_layers = 6
    args.decoder_embed_dim = 512
    args.decoder_ffn_embed_dim = 2048
    args.decoder_attention_heads = 8
    args.dropout = 0.1
    args.attention_dropout = 0.0
    args.activation_dropout = 0.0
    args.max_source_positions = 1024
    args.max_target_positions = 1024
    return args


@register_arch("transformer")
def transformer(args):
    return _transformer_text_base(args)


@register_arch("transformer_tiny")
def transformer_tiny(args):
    """transformer_legacy.py:155-166 (test-scale arch)."""
    _transformer_text_base(args)
    args.encoder_embed_dim = 64
    args.encoder_ffn_embed_dim = 64
    args.encoder_layers = 2
    args.encoder_attention_heads = 2
    args.decoder_layers = 2
    args.decoder_embed_dim = 64
    args.decoder_ffn_embed_dim = 64
    args.decoder_attention_heads = 2
    return args


@register_arch("transformer_iwslt_de_en")
def transformer_iwslt_de_en(args):
    _transformer_text_base(args)
    args.encoder_ffn_embed_dim = 1024
    args.encoder_attention_heads = 4
    args.decoder_ffn_embed_dim = 1024
    args.decoder_attention_heads = 4
    return args


@register_arch("transformer_from_pretrained_xlm")
def transformer_from_pretrained_xlm(args):
    """transformer_from_pretrained_xlm.py:151-153 = transformer base."""
    return _transformer_text_base(args)


@register_arch("transformer_align")
def transformer_align(args):
    """transformer_align.py:82-87: base transformer + alignment
    supervision defaults (1 head at layer 4)."""
    return _transformer_text_base(args)


@register_arch("transformer_wmt_en_de_big_align")
def transformer_wmt_en_de_big_align(args):
    """transformer_align.py:90-93."""
    return transformer_vaswani_wmt_en_de_big(args)


@register_arch("multilingual_transformer")
def multilingual_transformer(args):
    """multilingual_transformer.py:208-214 base arch = transformer base."""
    return _transformer_text_base(args)


@register_arch("multilingual_transformer_iwslt_de_en")
def multilingual_transformer_iwslt_de_en(args):
    """multilingual_transformer.py:217-229."""
    return transformer_iwslt_de_en(args)


@register_arch("transformer_wmt_en_de")
def transformer_wmt_en_de(args):
    return _transformer_text_base(args)


@register_arch("transformer_vaswani_wmt_en_de_big")
def transformer_vaswani_wmt_en_de_big(args):
    _transformer_text_base(args)
    args.encoder_embed_dim = 1024
    args.encoder_ffn_embed_dim = 4096
    args.encoder_attention_heads = 16
    args.decoder_embed_dim = 1024
    args.decoder_ffn_embed_dim = 4096
    args.decoder_attention_heads = 16
    args.dropout = 0.3
    return args


@register_arch("transformer_vaswani_wmt_en_fr_big")
def transformer_vaswani_wmt_en_fr_big(args):
    transformer_vaswani_wmt_en_de_big(args)
    args.dropout = 0.1
    return args


@register_arch("transformer_wmt_en_de_big")
def transformer_wmt_en_de_big(args):
    transformer_vaswani_wmt_en_de_big(args)
    args.attention_dropout = 0.1
    return args


@register_arch("transformer_wmt_en_de_big_t2t")
def transformer_wmt_en_de_big_t2t(args):
    transformer_vaswani_wmt_en_de_big(args)
    args.encoder_normalize_before = True
    args.decoder_normalize_before = True
    args.attention_dropout = 0.1
    args.activation_dropout = 0.1
    return args


def _nat_base(args):
    """cmlm/NAT base arch (cmlm_transformer.py:113-158,
    nonautoregressive_transformer.py:405-455): transformer base geometry;
    cmlm defaults share_all_embeddings=True."""
    _transformer_text_base(args)
    args.sg_length_pred = getattr(args, "sg_length_pred", False)
    args.pred_length_offset = getattr(args, "pred_length_offset", False)
    return args


@register_arch("cmlm_transformer")
def cmlm_transformer(args):
    _nat_base(args)
    args.share_all_embeddings = True
    return args


@register_arch("cmlm_transformer_wmt_en_de")
def cmlm_transformer_wmt_en_de(args):
    return cmlm_transformer(args)


@register_arch("nonautoregressive_transformer")
def nonautoregressive_transformer(args):
    return _nat_base(args)


@register_arch("levenshtein_transformer")
def levenshtein_transformer(args):
    """levenshtein_base_architecture (levenshtein_transformer.py:427-476):
    transformer-base geometry, early_exit '6,6,6', shared trunks."""
    return _nat_base(args)


@register_arch("levenshtein_transformer_wmt_en_de")
def levenshtein_transformer_wmt_en_de(args):
    return _nat_base(args)


@register_arch("nacrf_transformer")
def nacrf_transformer(args):
    """nacrf_base_architecture (nat_crf_transformer.py:113-121)."""
    _nat_base(args)
    args.encoder_normalize_before = True
    args.decoder_normalize_before = True
    return args


@register_arch("iterative_nonautoregressive_transformer")
def iterative_nonautoregressive_transformer(args):
    """inat_base_architecture: NAT base + multi-step training knobs."""
    _nat_base(args)
    args.train_step = getattr(args, "train_step", 4)
    args.dae_ratio = getattr(args, "dae_ratio", 0.5)
    args.stochastic_approx = getattr(args, "stochastic_approx", False)
    return args


@register_arch("insertion_transformer")
def insertion_transformer(args):
    """insertion_base_architecture (insertion_transformer.py:241-283)."""
    _nat_base(args)
    args.label_tau = getattr(args, "label_tau", None)
    return args


def _lightconv_base(args):
    """lightconv base_architecture (lightconv.py:906-969)."""
    _transformer_text_base(args)
    args.encoder_layers = 7
    args.dropout = 0.1
    args.attention_dropout = 0.0
    return args


@register_arch("lightconv")
def lightconv(args):
    return _lightconv_base(args)


@register_arch("lightconv_iwslt_de_en")
def lightconv_iwslt_de_en(args):
    """lightconv.py:971-986."""
    _lightconv_base(args)
    args.encoder_layers = 7
    args.encoder_ffn_embed_dim = 1024
    args.encoder_attention_heads = 4
    args.decoder_layers = 6
    args.decoder_ffn_embed_dim = 1024
    args.decoder_attention_heads = 4
    args.attention_dropout = 0.1
    args.weight_dropout = 0.1
    args.encoder_glu = False
    args.decoder_glu = False
    args.input_dropout = 0.0
    return args


@register_arch("lightconv_wmt_en_de")
def lightconv_wmt_en_de(args):
    return _lightconv_base(args)


@register_arch("dynamicconv")
def dynamicconv_arch(args):
    _lightconv_base(args)
    args.encoder_conv_type = "dynamic"
    args.decoder_conv_type = "dynamic"
    return args


def build_lightconv_config(args, src_vocab: int, tgt_vocab: int):
    """args -> LightConvConfig (LightConvModel.build_model plumbing)."""
    from .models.lightconv_model import LightConvConfig
    base = build_transformer_text_config(args, src_vocab, tgt_vocab)

    def klist(spec, default, n):
        ks = default if spec is None else \
            tuple(int(x) for x in str(spec).split(","))
        if len(ks) == 1:
            ks = ks * n
        assert len(ks) == n, "kernel_size_list doesn't match layers"
        return tuple(ks)

    wd = args.weight_dropout
    return LightConvConfig(
        base=base,
        conv_type=getattr(args, "encoder_conv_type", "lightweight"),
        encoder_kernel_sizes=klist(args.encoder_kernel_size_list,
                                   (3, 7, 15, 31, 31, 31, 31)[
                                       :args.encoder_layers]
                                   if args.encoder_layers <= 7 else None,
                                   args.encoder_layers),
        decoder_kernel_sizes=klist(args.decoder_kernel_size_list,
                                   (3, 7, 15, 31, 31, 31)[
                                       :args.decoder_layers]
                                   if args.decoder_layers <= 6 else None,
                                   args.decoder_layers),
        encoder_conv_dim=args.encoder_conv_dim or args.encoder_embed_dim,
        decoder_conv_dim=args.decoder_conv_dim or args.decoder_embed_dim,
        encoder_glu=args.encoder_glu,
        decoder_glu=args.decoder_glu,
        weight_softmax=args.weight_softmax,
        weight_dropout=wd if wd is not None else args.attention_dropout,
        input_dropout=args.input_dropout,
        relu_dropout=args.relu_dropout)


@register_arch("fconv")
def fconv(args):
    """fairseq/models/fconv.py base_architecture (:699-711): 20x(512,3)
    GLU conv encoder/decoder. Conv specs ride --encoder-conv-spec /
    --decoder-conv-spec (the reference overloads --encoder-layers with a
    python-literal string; we keep that flag an int and carry the spec on
    dedicated flags — same grammar)."""
    args.dropout = 0.1
    args.encoder_embed_dim = 512
    args.decoder_embed_dim = 512
    args.decoder_out_embed_dim = 256
    args.encoder_conv_spec = getattr(args, "encoder_conv_spec", None) \
        or "[(512, 3)] * 20"
    args.decoder_conv_spec = getattr(args, "decoder_conv_spec", None) \
        or "[(512, 3)] * 20"
    return args


@register_arch("fconv_iwslt_de_en")
def fconv_iwslt_de_en(args):
    fconv(args)
    args.encoder_embed_dim = 256
    args.decoder_embed_dim = 256
    args.decoder_out_embed_dim = 256
    args.encoder_conv_spec = "[(256, 3)] * 4"
    args.decoder_conv_spec = "[(256, 3)] * 3"
    return args


@register_arch("fconv_wmt_en_ro")
def fconv_wmt_en_ro(args):
    fconv(args)
    args.decoder_out_embed_dim = 512
    return args


@register_arch("fconv_wmt_en_de")
def fconv_wmt_en_de(args):
    fconv(args)
    convs = "[(512, 3)] * 9 + [(1024, 3)] * 4 + [(2048, 1)] * 2"
    args.encoder_embed_dim = 768
    args.decoder_embed_dim = 768
    args.decoder_out_embed_dim = 512
    args.encoder_conv_spec = convs
    args.decoder_conv_spec = convs
    return args


@register_arch("fconv_wmt_en_fr")
def fconv_wmt_en_fr(args):
    fconv(args)
    convs = ("[(512, 3)] * 6 + [(768, 3)] * 4 + [(1024, 3)] * 3 + "
             "[(2048, 1)] * 1 + [(4096, 1)] * 1")
    args.encoder_embed_dim = 768
    args.decoder_embed_dim = 768
    args.decoder_out_embed_dim = 512
    args.encoder_conv_spec = convs
    args.decoder_conv_spec = convs
    return args


def _bool_expr(s, n: int):
    """fconv_self_att bool-EXPR flags: "True" / "[True] + [False]*5"."""
    import ast
    v = ast.literal_eval(str(s)) if str(s).strip().startswith("[") \
        else (str(s).strip() == "True")
    if isinstance(v, bool):
        return (v,) * n
    assert len(v) == n, f"bool expr length {len(v)} != layers {n}"
    return tuple(bool(x) for x in v)


def build_fconv_self_att_config(args, src_vocab: int, tgt_vocab: int):
    """args -> FConvSelfAttConfig (FConvModelSelfAtt.build_model)."""
    import ast

    import jax.numpy as jnp

    from .models.fconv_self_att import FConvSelfAttConfig

    def spec(s, default):
        v = tuple(tuple(t) for t in conv_spec_expr(str(s or default)))
        return v

    enc = spec(getattr(args, "encoder_conv_spec", None), "[(512, 3)] * 3")
    dec = spec(getattr(args, "decoder_conv_spec", None), "[(512, 3)] * 8")
    dec_attn = getattr(args, "decoder_attention", "True")
    if dec_attn in (True, None, ""):
        dec_attn = "True"
    return FConvSelfAttConfig(
        src_vocab_size=src_vocab, tgt_vocab_size=tgt_vocab,
        encoder_embed_dim=args.encoder_embed_dim,
        encoder_convs=enc,
        decoder_embed_dim=args.decoder_embed_dim,
        decoder_convs=dec,
        decoder_out_embed_dim=getattr(args, "decoder_out_embed_dim", None)
        or 256,
        decoder_attention=_bool_expr(dec_attn, len(dec)),
        self_attention=_bool_expr(
            getattr(args, "self_attention", "False"), len(dec)),
        encoder_attention=_bool_expr(
            getattr(args, "encoder_attention", "False"), len(enc)),
        attention_nheads=getattr(args, "multihead_attention_nheads", 1),
        selfattention_nheads=getattr(
            args, "multihead_self_attention_nheads", 1),
        encoder_attention_nheads=getattr(
            args, "encoder_attention_nheads", 1),
        project_input=str(getattr(args, "project_input", "False")).strip()
        == "True",
        gated_attention=str(getattr(args, "gated_attention",
                                    "False")).strip() == "True",
        downsample=str(getattr(args, "downsample", "False")).strip()
        == "True",
        dropout=args.dropout,
        max_source_positions=args.max_source_positions,
        max_target_positions=args.max_target_positions,
        dtype=jnp.bfloat16 if (args.fp16 or args.bf16) else jnp.float32)


@register_arch("fconv_self_att")
def fconv_self_att(args):
    """fconv_self_att.py:633-654 base arch."""
    args.dropout = 0.1
    args.encoder_embed_dim = 512
    args.decoder_embed_dim = 512
    args.decoder_out_embed_dim = 256
    return args


@register_arch("fconv_self_att_wp")
def fconv_self_att_wp(args):
    """fconv_self_att.py:656-675: writing-prompts operating point (gated,
    downsampled 4-head self-attention)."""
    args.dropout = 0.1
    args.encoder_embed_dim = 256
    args.decoder_embed_dim = 256
    args.decoder_out_embed_dim = 256
    args.encoder_conv_spec = getattr(args, "encoder_conv_spec", None) \
        or "[(128, 3)] * 2 + [(512,3)] * 1"
    args.decoder_conv_spec = getattr(args, "decoder_conv_spec", None) \
        or "[(512, 4)] * 4 + [(768, 4)] * 2 + [(1024, 4)] * 1"
    args.self_attention = "True"
    args.multihead_self_attention_nheads = 4
    args.project_input = "True"
    args.gated_attention = "True"
    args.downsample = "True"
    return args


def build_fconv_config(args, src_vocab: int, tgt_vocab: int):
    """args -> FConvConfig (FConvModel.build_model plumbing,
    fconv.py:80-139)."""
    import ast
    import jax.numpy as jnp
    from .models.fconv import FConvConfig, extend_conv_spec

    # safe literal evaluation of "[(512, 3)] * 20 + ..." specs
    def safe_spec(s, default):
        node = ast.parse(str(s or default), mode="eval")

        def ev(n):
            if isinstance(n, ast.Expression):
                return ev(n.body)
            if isinstance(n, (ast.List, ast.Tuple)):
                v = [ev(e) for e in n.elts]
                return v if isinstance(n, ast.List) else tuple(v)
            if isinstance(n, ast.Constant) and isinstance(n.value, int):
                return n.value
            if isinstance(n, ast.BinOp) and isinstance(n.op, ast.Add):
                return ev(n.left) + ev(n.right)
            if isinstance(n, ast.BinOp) and isinstance(n.op, ast.Mult):
                return ev(n.left) * ev(n.right)
            raise ValueError(f"bad conv spec: {ast.dump(n)}")
        return extend_conv_spec(tuple(tuple(t) for t in ev(node)))

    attn = getattr(args, "decoder_attention", True)
    if isinstance(attn, str) and attn.strip().startswith("["):
        attn = tuple(bool(x) for x in ast.literal_eval(attn))
    else:
        attn = ()          # () -> attention at every layer
    dec_convs = safe_spec(getattr(args, "decoder_conv_spec", None),
                          "[(512, 3)] * 20")
    return FConvConfig(
        src_vocab=src_vocab, tgt_vocab=tgt_vocab,
        encoder_embed_dim=args.encoder_embed_dim,
        decoder_embed_dim=args.decoder_embed_dim,
        decoder_out_embed_dim=getattr(args, "decoder_out_embed_dim", 256),
        encoder_convs=safe_spec(getattr(args, "encoder_conv_spec", None),
                                "[(512, 3)] * 20"),
        decoder_convs=dec_convs,
        decoder_attention=tuple(attn) if attn else (),
        dropout=args.dropout,
        share_input_output_embed=getattr(
            args, "share_input_output_embed", False),
        max_source_positions=getattr(args, "max_source_positions", 1024),
        max_target_positions=getattr(args, "max_target_positions", 1024),
        dtype=jnp.bfloat16 if (args.fp16 or args.bf16) else jnp.float32)


@register_arch("fconv_lm")
def fconv_lm(args):
    """fconv_lm.py base_lm_architecture (:95-102): 13x(1268,4) GLU conv
    decoder-only LM, no positions, no attention."""
    args.dropout = 0.1
    args.decoder_embed_dim = 128
    args.decoder_conv_spec = getattr(args, "decoder_conv_spec", None) \
        or "[(1268, 4)] * 13"
    return args


@register_arch("fconv_lm_dauphin_wikitext103")
def fconv_lm_dauphin_wikitext103(args):
    fconv_lm(args)
    args.decoder_embed_dim = 280
    args.decoder_conv_spec = ("[(850, 6)] * 3 + [(850, 1)] * 1 + "
                              "[(850, 5)] * 4 + [(850, 1)] * 1 + "
                              "[(850, 4)] * 3 + [(1024, 4)] * 1 + "
                              "[(2048, 4)] * 1")
    return args


@register_arch("fconv_lm_dauphin_gbw")
def fconv_lm_dauphin_gbw(args):
    fconv_lm(args)
    args.decoder_embed_dim = 128
    args.decoder_conv_spec = ("[(512, 5)] + [(128, 1, 0), (128, 5, 0), "
                              "(512, 1, 3)] * 3 + [(512, 1, 0), "
                              "(512, 5, 0), (1024, 1, 3)] * 3 + "
                              "[(1024, 1, 0), (1024, 5, 0), "
                              "(2048, 1, 3)] * 6 + [(1024, 1, 0), "
                              "(1024, 5, 0), (4096, 1, 3)]")
    return args


@register_arch("lstm")
def lstm(args):
    """fairseq/models/lstm.py base_architecture: 1x512 uni-directional
    encoder, input-feeding attention decoder."""
    args.encoder_embed_dim = 512
    args.encoder_layers = 1
    args.decoder_embed_dim = 512
    args.decoder_layers = 1
    args.dropout = 0.1
    return args


@register_arch("lstm_wiseman_iwslt_de_en")
def lstm_wiseman_iwslt_de_en(args):
    lstm(args)
    args.encoder_embed_dim = 256
    args.decoder_embed_dim = 256
    args.decoder_out_embed_dim = 256
    args.encoder_dropout_in = 0.0
    args.encoder_dropout_out = 0.0
    args.decoder_dropout_in = 0.0
    return args


@register_arch("lstm_luong_wmt_en_de")
def lstm_luong_wmt_en_de(args):
    lstm(args)
    args.encoder_embed_dim = 1000
    args.encoder_layers = 4
    args.decoder_embed_dim = 1000
    args.decoder_layers = 4
    args.decoder_out_embed_dim = 1000
    args.encoder_dropout_out = 0.0
    args.decoder_dropout_out = 0.0
    return args


def build_lstm_config(args, src_vocab: int, tgt_vocab: int):
    """args -> LSTMConfig (fairseq LSTMModel.build_model arg plumbing:
    hidden sizes default to embed dims, dropout_in/out default to
    --dropout)."""
    import jax.numpy as jnp
    from .models.lstm import LSTMConfig

    def dflt(v, d):
        return d if v is None else v

    return LSTMConfig(
        src_vocab_size=src_vocab,
        tgt_vocab_size=tgt_vocab,
        encoder_embed_dim=args.encoder_embed_dim,
        encoder_hidden_size=dflt(args.encoder_hidden_size,
                                 args.encoder_embed_dim),
        encoder_layers=args.encoder_layers,
        encoder_bidirectional=args.encoder_bidirectional,
        encoder_dropout_in=dflt(args.encoder_dropout_in, args.dropout),
        encoder_dropout_out=dflt(args.encoder_dropout_out, args.dropout),
        decoder_embed_dim=args.decoder_embed_dim,
        decoder_hidden_size=dflt(args.decoder_hidden_size,
                                 args.decoder_embed_dim),
        decoder_layers=args.decoder_layers,
        decoder_out_embed_dim=dflt(args.decoder_out_embed_dim, 512),
        decoder_attention=args.decoder_attention,
        decoder_dropout_in=dflt(args.decoder_dropout_in, args.dropout),
        decoder_dropout_out=dflt(args.decoder_dropout_out, args.dropout),
        share_decoder_input_output_embed=getattr(
            args, "share_decoder_input_output_embed", False),
        share_all_embeddings=getattr(args, "share_all_embeddings", False),
        max_source_positions=args.max_source_positions,
        max_target_positions=args.max_target_positions,
        dtype=jnp.bfloat16 if (args.fp16 or args.bf16) else jnp.float32)


def _lm_base(args):
    """base_lm_architecture (fairseq/models/transformer_lm.py:302-371):
    decoder_normalize_before is force-pinned in the model config."""
    args.decoder_embed_dim = 512
    args.decoder_ffn_embed_dim = 2048
    args.decoder_layers = 6
    args.decoder_attention_heads = 8
    args.dropout = 0.1
    args.attention_dropout = 0.0
    args.activation_dropout = 0.0
    args.activation_fn = "relu"
    args.max_target_positions = getattr(args, "tokens_per_sample", 1024)
    return args


@register_arch("transformer_lm")
def transformer_lm(args):
    return _lm_base(args)


@register_arch("masked_lm")
def masked_lm_arch(args):
    """fairseq/models/masked_lm.py:314-342 base arch: 6x1024 relu
    post-norm sentence encoder, 2 segments."""
    args.dropout = 0.1
    args.attention_dropout = 0.1
    args.activation_dropout = 0.0
    args.encoder_ffn_embed_dim = 4096
    args.encoder_layers = 6
    args.encoder_attention_heads = 8
    args.encoder_embed_dim = 1024
    args.activation_fn = "relu"
    return args


@register_arch("bert_base")
def bert_base_arch(args):
    """masked_lm.py:344-370: 12x768 gelu, tied embeddings, learned pos,
    normalize-before embedding LN."""
    masked_lm_arch(args)
    args.encoder_embed_dim = 768
    args.encoder_layers = 12
    args.encoder_attention_heads = 12
    args.encoder_ffn_embed_dim = 3072
    args.share_encoder_input_output_embed = True
    args.encoder_learned_pos = True
    args.activation_fn = "gelu"
    args.encoder_normalize_before = True
    args.apply_bert_init = True
    args.sent_loss = True
    return args


@register_arch("bert_large")
def bert_large_arch(args):
    """masked_lm.py:372-378."""
    bert_base_arch(args)
    args.encoder_embed_dim = 1024
    args.encoder_layers = 24
    args.encoder_attention_heads = 16
    args.encoder_ffn_embed_dim = 4096
    return args


@register_arch("xlm_base")
def xlm_base_arch(args):
    """masked_lm.py:381-403: 16x1024 gelu, tied embeddings, learned pos,
    1 segment, bert init."""
    masked_lm_arch(args)
    args.encoder_embed_dim = 1024
    args.encoder_layers = 16
    args.encoder_attention_heads = 16
    args.encoder_ffn_embed_dim = 4096
    args.share_encoder_input_output_embed = True
    args.encoder_learned_pos = True
    args.activation_fn = "gelu"
    args.num_segment = 1
    args.apply_bert_init = True
    return args


@register_arch("lstm_lm")
def lstm_lm(args):
    """fairseq/models/lstm_lm.py:124-142 base_architecture: 1x512
    decoder-only LSTM, no attention/input-feed."""
    args.dropout = 0.1
    args.decoder_embed_dim = 512
    args.decoder_layers = 1
    args.decoder_out_embed_dim = 512
    return args


@register_arch("lightconv_lm")
def lightconv_lm(args):
    """fairseq/models/lightconv_lm.py:126-167 base_lm_architecture:
    6-layer normalize-before LightConv decoder, kernels 3,7,15,31,31,31."""
    args.decoder_embed_dim = 512
    args.decoder_ffn_embed_dim = 2048
    args.decoder_layers = 6
    args.decoder_attention_heads = 8
    args.decoder_normalize_before = True
    args.decoder_conv_dim = getattr(args, "decoder_conv_dim", None) \
        or args.decoder_embed_dim
    if getattr(args, "decoder_kernel_size_list", None) is None \
            and args.decoder_layers <= 6:
        args.decoder_kernel_size_list = ",".join(
            str(k) for k in (3, 7, 15, 31, 31, 31)[:args.decoder_layers])
    args.max_target_positions = getattr(args, "tokens_per_sample", 1024)
    return args


@register_arch("lightconv_lm_gbw")
def lightconv_lm_gbw(args):
    """lightconv_lm.py:170-177."""
    lightconv_lm(args)
    args.decoder_embed_dim = 512
    args.dropout = 0.1
    args.attention_dropout = 0.1
    args.decoder_ffn_embed_dim = 4096
    args.decoder_attention_heads = 16
    return args


@register_arch("bart_large")
def bart_large(args):
    """bart_large_architecture (bart/model.py:316-356): 12+12 x 1024
    gelu, learned positions, layernorm_embedding, fully shared embeds."""
    _transformer_text_base(args)
    args.encoder_layers = 12
    args.encoder_embed_dim = 1024
    args.encoder_ffn_embed_dim = 4096
    args.encoder_attention_heads = 16
    args.decoder_layers = 12
    args.decoder_embed_dim = 1024
    args.decoder_ffn_embed_dim = 4096
    args.decoder_attention_heads = 16
    args.share_decoder_input_output_embed = True
    args.share_all_embeddings = True
    args.layernorm_embedding = True
    args.no_scale_embedding = True
    args.activation_fn = "gelu"
    args.encoder_learned_pos = True
    args.decoder_learned_pos = True
    return args


@register_arch("bart_base")
def bart_base(args):
    bart_large(args)
    args.encoder_layers = 6
    args.encoder_embed_dim = 768
    args.encoder_ffn_embed_dim = 3072
    args.encoder_attention_heads = 12
    args.decoder_layers = 6
    args.decoder_embed_dim = 768
    args.decoder_ffn_embed_dim = 3072
    args.decoder_attention_heads = 12
    return args


@register_arch("mbart_large")
def mbart_large(args):
    """mbart_large_architecture (bart/model.py:369-372): bart_large with
    embedding scaling back ON (no_scale_embedding=False); formulation stays
    bart's post-norm — the paper mBART checkpoints' pre-norm comes from
    training-time --encoder/--decoder-normalize-before, not the arch fn."""
    bart_large(args)
    args.no_scale_embedding = False
    return args


@register_arch("roberta")
def roberta(args):
    """roberta base_architecture (roberta/model.py:524-547): 12x768 gelu
    post-norm encoder with learned positions + embedding layernorm."""
    args.encoder_layers = 12
    args.encoder_embed_dim = 768
    args.encoder_ffn_embed_dim = 3072
    args.encoder_attention_heads = 12
    args.dropout = 0.1
    args.attention_dropout = 0.1
    args.activation_dropout = 0.0
    args.activation_fn = "gelu"
    # post-norm formulation (roberta_prenorm flips these; explicit CLI
    # flags still win via _two_pass's explicit-flag restore)
    args.encoder_normalize_before = False
    args.layernorm_embedding = True
    args.no_final_layer_norm = False
    return args


@register_arch("roberta_base")
def roberta_base(args):
    return roberta(args)


@register_arch("roberta_large")
def roberta_large(args):
    roberta(args)
    args.encoder_layers = 24
    args.encoder_embed_dim = 1024
    args.encoder_ffn_embed_dim = 4096
    args.encoder_attention_heads = 16
    return args


@register_arch("transformer_lm_big")
def transformer_lm_big(args):
    _lm_base(args)
    args.decoder_layers = 12
    args.decoder_embed_dim = 1024
    args.decoder_ffn_embed_dim = 4096
    args.decoder_attention_heads = 16
    return args


@register_arch("transformer_lm_gpt")
def transformer_lm_gpt(args):
    _lm_base(args)
    args.decoder_embed_dim = 768
    args.decoder_ffn_embed_dim = 3072
    args.decoder_layers = 12
    args.decoder_attention_heads = 12
    args.attention_dropout = 0.1
    args.activation_fn = "gelu"
    return args


@register_arch("transformer_lm_wiki103")
def transformer_lm_wiki103(args):
    """transformer_lm_baevski_wiki103 (transformer_lm.py:382-399): big LM
    with fully tied adaptive input + adaptive softmax."""
    _lm_base(args)
    args.decoder_layers = 16
    args.decoder_embed_dim = 1024
    args.decoder_ffn_embed_dim = 4096
    args.decoder_attention_heads = 8
    args.dropout = 0.3
    args.adaptive_input = True
    args.tie_adaptive_weights = True
    args.adaptive_input_cutoff = "20000,60000"
    args.adaptive_softmax_cutoff = "20000,60000"
    args.adaptive_softmax_dropout = 0.2
    args.attention_dropout = 0.1
    args.activation_dropout = 0.1
    args.no_decoder_final_norm = True
    args.tie_adaptive_proj = True
    return args


@register_arch("transformer_lm_gbw")
def transformer_lm_gbw(args):
    """transformer_lm_baevski_gbw (transformer_lm.py:402-409)."""
    _lm_base(args)
    args.decoder_layers = 12
    args.decoder_embed_dim = 512
    args.decoder_ffn_embed_dim = 4096
    args.decoder_attention_heads = 16
    args.attention_dropout = 0.1
    args.no_decoder_final_norm = True
    return args


@register_arch("transformer_lm_gpt2_small")
def transformer_lm_gpt2_small(args):
    transformer_lm_gpt(args)
    args.decoder_embed_dim = 1024
    args.decoder_ffn_embed_dim = 4096
    args.decoder_layers = 24
    args.decoder_attention_heads = 16
    return args


@register_arch("transformer_lm_gpt2_tiny")
def transformer_lm_gpt2_tiny(args):
    transformer_lm_gpt(args)
    args.decoder_embed_dim = 64
    args.decoder_ffn_embed_dim = 64
    args.decoder_layers = 2
    args.decoder_attention_heads = 1
    return args


def build_transformer_text_config(args, src_vocab: int, tgt_vocab: int):
    """args -> TransformerTextConfig (tasks/translation.py model build)."""
    import jax.numpy as jnp
    from .models.transformer_text import TransformerTextConfig
    return TransformerTextConfig(
        src_vocab_size=src_vocab,
        tgt_vocab_size=tgt_vocab,
        encoder_layers=args.encoder_layers,
        encoder_embed_dim=args.encoder_embed_dim,
        encoder_ffn_embed_dim=args.encoder_ffn_embed_dim,
        encoder_attention_heads=args.encoder_attention_heads,
        encoder_normalize_before=args.encoder_normalize_before,
        decoder_layers=args.decoder_layers,
        decoder_embed_dim=args.decoder_embed_dim,
        decoder_ffn_embed_dim=args.decoder_ffn_embed_dim,
        decoder_attention_heads=args.decoder_attention_heads,
        decoder_normalize_before=args.decoder_normalize_before,
        dropout=args.dropout,
        attention_dropout=args.attention_dropout,
        activation_dropout=args.activation_dropout,
        activation_fn=args.activation_fn,
        no_scale_embedding=args.no_scale_embedding,
        layernorm_embedding=getattr(args, "layernorm_embedding", False),
        encoder_learned_pos=getattr(args, "encoder_learned_pos", False),
        decoder_learned_pos=getattr(args, "decoder_learned_pos", False),
        share_decoder_input_output_embed=getattr(
            args, "share_decoder_input_output_embed", False),
        share_all_embeddings=getattr(args, "share_all_embeddings", False),
        max_source_positions=args.max_source_positions,
        max_target_positions=args.max_target_positions,
        lm_head_out_proj=getattr(args, "lm_head_out_proj", False),
        quant_noise_pq=float(getattr(args, "quant_noise_pq", 0.0) or 0.0),
        dtype=jnp.bfloat16 if (args.fp16 or args.bf16) else jnp.float32)


@register_arch("s2st_transformer_small")
def s2st_transformer_small(args):
    args.encoder_layers = 6
    args.encoder_embed_dim = 256
    args.encoder_ffn_embed_dim = 1024
    args.decoder_layers = 4
    args.decoder_embed_dim = 256
    args.decoder_ffn_embed_dim = 1024
    args.conv_channels = 256
    args.postnet_conv_dim = 256
    return args


# ---------------------------------------------------------------------------
# reference --arch name completion (remaining hyperparameter presets)
# ---------------------------------------------------------------------------
# Every fairseq --arch name resolves here so reference command lines keep
# working; bodies mirror the reference's register_model_architecture default
# chains (file:line cited per family). Explicit CLI flags still win via
# _two_pass's explicit-flag restore. The reference's model_parallel /
# pipeline_parallel variants are geometry presets here: tensor and pipeline
# partitioning are mesh axes (--tp-size / --pp-size, parallel/mesh.py +
# parallel/pipeline.py), not separate model classes.


def _s2t_size(args, dim, heads, ffn, drop):
    """s2t_transformer s/m/l ladder (speech_to_text/s2t_transformer.py:
    460-513); the s2t_transformer_hubert ladder is identical
    (s2t_transformer_me.py:536-592). The reference's base chains
    decoder dims off the encoder's, so both sides are pinned."""
    args.encoder_embed_dim = dim
    args.decoder_embed_dim = dim
    args.encoder_ffn_embed_dim = ffn
    args.decoder_ffn_embed_dim = ffn
    args.encoder_attention_heads = heads
    args.decoder_attention_heads = heads
    args.dropout = drop
    return args


@register_arch("s2t_transformer_s")
def s2t_transformer_s(args):
    return _s2t_size(args, 256, 4, 2048, 0.1)


@register_arch("s2t_transformer_xs")
def s2t_transformer_xs(args):
    s2t_transformer_s(args)
    args.encoder_layers = 6
    args.decoder_layers = 3
    args.encoder_ffn_embed_dim = 1024
    args.decoder_ffn_embed_dim = 1024
    args.dropout = 0.3
    return args


@register_arch("s2t_transformer_sp")
def s2t_transformer_sp(args):
    s2t_transformer_s(args)
    args.encoder_layers = 16
    return args


@register_arch("s2t_transformer_m")
def s2t_transformer_m(args):
    return _s2t_size(args, 512, 8, 2048, 0.15)


@register_arch("s2t_transformer_mp")
def s2t_transformer_mp(args):
    s2t_transformer_m(args)
    args.encoder_layers = 16
    return args


@register_arch("s2t_transformer_l")
def s2t_transformer_l(args):
    return _s2t_size(args, 1024, 16, 4096, 0.2)


@register_arch("s2t_transformer_lp")
def s2t_transformer_lp(args):
    s2t_transformer_l(args)
    args.encoder_layers = 16
    return args


for _sz in ("s", "xs", "sp", "m", "mp", "l", "lp"):
    def _hubert_size(args, _sz=_sz):
        ARCH_REGISTRY[f"s2t_transformer_{_sz}"](args)
        args.use_hubert = True
        return args
    register_arch(f"s2t_transformer_hubert_{_sz}")(_hubert_size)
del _sz, _hubert_size


@register_arch("transformer_lm_gpt2_medium")
def transformer_lm_gpt2_medium(args):
    """transformer_lm.py:448-457."""
    transformer_lm_gpt(args)
    args.decoder_embed_dim = 1280
    args.decoder_ffn_embed_dim = 5120
    args.decoder_layers = 36
    args.decoder_attention_heads = 20
    return args


@register_arch("transformer_lm_gpt2_big")
def transformer_lm_gpt2_big(args):
    """transformer_lm.py:460-469."""
    transformer_lm_gpt(args)
    args.decoder_embed_dim = 1600
    args.decoder_ffn_embed_dim = 6400
    args.decoder_layers = 48
    args.decoder_attention_heads = 25
    return args


def _lm_gpt3(args, layers, dim, heads):
    """base_gpt3_architecture (transformer_lm.py:472-484): learned
    positions, zero dropout, gelu, tied input/output embedding,
    ffn = 4*dim."""
    _lm_base(args)
    args.decoder_layers = layers
    args.decoder_embed_dim = dim
    args.decoder_ffn_embed_dim = dim * 4
    args.decoder_attention_heads = heads
    args.decoder_learned_pos = True
    args.dropout = 0.0
    args.attention_dropout = 0.0
    args.activation_fn = "gelu"
    args.share_decoder_input_output_embed = True
    return args


for _name, _shape in (("small", (12, 768, 12)), ("medium", (24, 1024, 16)),
                      ("large", (24, 1536, 16)), ("xl", (24, 2048, 32)),
                      ("2_7", (32, 2560, 32)), ("6_7", (32, 4096, 32)),
                      ("13", (40, 5120, 40)), ("175", (96, 12288, 96))):
    def _gpt3_arch(args, _shape=_shape):
        return _lm_gpt3(args, *_shape)
    register_arch(f"transformer_lm_gpt3_{_name}")(_gpt3_arch)
del _name, _shape, _gpt3_arch


@register_arch("transformer_lm_megatron")
def transformer_lm_megatron(args):
    """model_parallel/models/transformer_lm.py:151-160 — the 8.3B Megatron
    LM geometry; intra-layer model parallelism is --tp-size (column/row
    mesh rules) here."""
    _lm_base(args)
    args.decoder_embed_dim = 3072
    args.decoder_ffn_embed_dim = 3072 * 4
    args.decoder_layers = 72
    args.decoder_attention_heads = 32
    args.attention_dropout = 0.1
    args.activation_fn = "gelu"
    return args


@register_arch("transformer_lm_megatron_11b")
def transformer_lm_megatron_11b(args):
    """model_parallel/models/transformer_lm.py:163-175 (ffn = 6*dim)."""
    transformer_lm_megatron(args)
    args.decoder_ffn_embed_dim = 3072 * 6
    return args


# reference registers the wiki103/gbw presets under both names
# (transformer_lm.py:382-383, 402-403)
register_arch("transformer_lm_baevski_wiki103")(transformer_lm_wiki103)
register_arch("transformer_lm_baevski_gbw")(transformer_lm_gbw)


@register_arch("lightconv_wmt_en_de_big")
def lightconv_wmt_en_de_big(args):
    """lightconv.py big ladder."""
    _lightconv_base(args)
    args.encoder_embed_dim = 1024
    args.encoder_ffn_embed_dim = 4096
    args.encoder_attention_heads = 16
    args.decoder_embed_dim = 1024
    args.decoder_ffn_embed_dim = 4096
    args.decoder_attention_heads = 16
    args.attention_dropout = 0.1
    args.dropout = 0.3
    return args


@register_arch("lightconv_wmt_en_fr_big")
def lightconv_wmt_en_fr_big(args):
    lightconv_wmt_en_de_big(args)
    args.dropout = 0.1
    return args


@register_arch("lightconv_wmt_zh_en_big")
def lightconv_wmt_zh_en_big(args):
    lightconv_wmt_en_de_big(args)
    args.dropout = 0.2
    args.attention_dropout = 0.2
    args.weight_dropout = 0.2
    return args


@register_arch("mbart_base")
def mbart_base(args):
    """mbart_base_architecture (bart/model.py:375-378): bart_base with
    embedding scaling ON."""
    bart_base(args)
    args.no_scale_embedding = False
    return args


@register_arch("mbart_base_wmt20")
def mbart_base_wmt20(args):
    """bart/model.py:381-384: mbart_base without embedding layernorm."""
    mbart_base(args)
    args.layernorm_embedding = False
    return args


@register_arch("roberta_prenorm")
def roberta_prenorm(args):
    """roberta_prenorm_architecture (roberta/model.py:547-551): pre-LN
    layers, no embedding LN (a final LN closes the trunk)."""
    roberta(args)
    args.layernorm_embedding = False
    args.encoder_normalize_before = True
    return args


@register_arch("xlm")
def roberta_xlm(args):
    """xlm_architecture (roberta/model.py:588-594): 16x1280 geometry on
    the roberta trunk."""
    roberta(args)
    args.encoder_layers = 16
    args.encoder_embed_dim = 1280
    args.encoder_ffn_embed_dim = 1280 * 4
    args.encoder_attention_heads = 16
    return args


@register_arch("model_parallel_roberta")
@register_arch("model_parallel_roberta_base")
def model_parallel_roberta(args):
    """model_parallel/models/roberta/model.py:192-216 — Megatron RoBERTa
    defaults to the pre-LN formulation; tensor parallelism itself is
    --tp-size here."""
    return roberta_prenorm(args)


@register_arch("model_parallel_roberta_v1")
def model_parallel_roberta_v1(args):
    """:200-203 — early model-parallel RoBERTa dropped the final LN."""
    roberta_prenorm(args)
    args.no_final_layer_norm = True
    return args


@register_arch("model_parallel_roberta_postnorm")
def model_parallel_roberta_postnorm(args):
    """:206-211 — the original Post-LN formulation (== roberta_base)."""
    return roberta(args)


@register_arch("model_parallel_roberta_large")
def model_parallel_roberta_large(args):
    """:219-226 — large geometry on the pre-LN default."""
    model_parallel_roberta(args)
    args.encoder_layers = 24
    args.encoder_embed_dim = 1024
    args.encoder_ffn_embed_dim = 4096
    args.encoder_attention_heads = 16
    return args


@register_arch("levenshtein_transformer_vaswani_wmt_en_de_big")
def levenshtein_transformer_vaswani_wmt_en_de_big(args):
    """nat/levenshtein_transformer.py vaswani-big geometry."""
    _nat_base(args)
    args.encoder_embed_dim = 1024
    args.encoder_ffn_embed_dim = 4096
    args.encoder_attention_heads = 16
    args.decoder_embed_dim = 1024
    args.decoder_ffn_embed_dim = 4096
    args.decoder_attention_heads = 16
    args.dropout = 0.3
    return args


@register_arch("levenshtein_transformer_wmt_en_de_big")
def levenshtein_transformer_wmt_en_de_big(args):
    """t2t variant: vaswani-big + pre-norm + attn/act dropout 0.1."""
    levenshtein_transformer_vaswani_wmt_en_de_big(args)
    args.encoder_normalize_before = True
    args.decoder_normalize_before = True
    args.attention_dropout = 0.1
    args.activation_dropout = 0.1
    return args


# wmt_en_de NAT presets == their base architectures in the reference
register_arch("nonautoregressive_transformer_wmt_en_de")(
    ARCH_REGISTRY["nonautoregressive_transformer"])
register_arch("iterative_nonautoregressive_transformer_wmt_en_de")(
    ARCH_REGISTRY["iterative_nonautoregressive_transformer"])

# pipeline_parallel_transformer archs (model_parallel/models/
# pipeline_parallel_transformer/model.py): same structural geometry as
# their non-pipeline bases; pipeline partitioning is --pp-size here.
register_arch("transformer_iwslt_de_en_pipeline_parallel")(
    ARCH_REGISTRY["transformer_iwslt_de_en"])
register_arch("transformer_wmt_en_de_big_pipeline_parallel")(
    ARCH_REGISTRY["transformer_wmt_en_de_big"])


@register_arch("s2t_berard_512_5_3")
def s2t_berard_512_5_3(args):
    """berard.py:599-616 (Audiobooks fr-en operating point)."""
    s2t_berard(args)
    args.num_blstm_layers = 5
    args.lstm_size = 512
    args.dropout = 0.3
    args.decoder_embed_dim = 256
    args.decoder_num_layers = 3
    args.decoder_hidden_dim = 1024
    args.attention_dim = 512
    args.output_layer_dim = 256
    return args


@register_arch("s2t_berard_512_3_2")
def s2t_berard_512_3_2(args):
    """berard.py:577-596."""
    s2t_berard_512_5_3(args)
    args.num_blstm_layers = 3
    args.decoder_num_layers = 2
    return args


@register_arch("roberta_enc_dec")
def roberta_enc_dec(args):
    """roberta/enc_dec.py:183-196 base_enc_dec_architecture: a RoBERTa-base
    trunk (roberta/model.py:527-547) as the encoder plus a TransformerDecoder
    whose args mirror the encoder's (read_args_from_roberta, enc_dec.py:
    138-160 — dims/heads/layers/normalize_before/learned-pos copied over,
    max_target_positions = max_positions = 512). Both sides keep RoBERTa's
    no_scale_embedding=True, learned pad-aware positions and embedding LN,
    post-norm layers, gelu. The output projection is a full RobertaLMHead
    (dense -> gelu -> LN -> proj + free bias, enc_dec.py:96-101) —
    ``lm_head_out_proj`` in models/transformer_text.py."""
    roberta(args)
    args.decoder_layers = args.encoder_layers
    args.decoder_embed_dim = args.encoder_embed_dim
    args.decoder_ffn_embed_dim = args.encoder_ffn_embed_dim
    args.decoder_attention_heads = args.encoder_attention_heads
    args.decoder_normalize_before = args.encoder_normalize_before
    args.encoder_learned_pos = True
    args.decoder_learned_pos = True
    args.no_scale_embedding = True
    args.layernorm_embedding = True
    args.max_source_positions = 512
    args.max_target_positions = 512
    args.lm_head_out_proj = True
    return args


@register_arch("dummy_model")
def dummy_model_arch(args):
    """benchmark/dummy_model.py:94-96 — the reference arch fn is a no-op;
    pairs with the dummy_lm/dummy_masked_lm benchmark tasks, which here
    run the production transformer_lm/roberta train steps."""
    return args


# ---------------------------------------------------------------------------
# parsers
# ---------------------------------------------------------------------------

def _two_pass(parser: argparse.ArgumentParser, argv: Optional[List[str]]):
    """--user-dir import first (registers plugins), then parse, then apply
    arch defaults (options.py:88-218 parity)."""
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--user-dir", default=None)
    pre_args, _ = pre.parse_known_args(argv)
    populate_builtin()
    if pre_args.user_dir:
        import_user_module(pre_args.user_dir)
    args = parser.parse_args(argv)
    arch = getattr(args, "arch", None)
    if arch is not None:
        if arch not in ARCH_REGISTRY:
            raise KeyError(f"unknown arch {arch}: {list(ARCH_REGISTRY)}")
        # arch fn sets structural defaults; explicit user flags win
        explicit = _explicit_flags(argv)
        saved = {k: v for k, v in vars(args).items()}
        ARCH_REGISTRY[arch](args)
        for k in explicit:
            if k in saved:
                setattr(args, k, saved[k])
    return args


def _explicit_flags(argv: Optional[List[str]]) -> List[str]:
    import sys
    argv = argv if argv is not None else sys.argv[1:]
    out = []
    for a in argv:
        if a.startswith("--"):
            out.append(a[2:].split("=")[0].replace("-", "_"))
    return out


def get_training_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser("s2st_tpu-train")
    add_common_args(parser)
    add_task_args(parser)
    add_model_args(parser)
    add_wav2vec2_args(parser)
    add_criterion_args(parser)
    add_optimization_args(parser)
    add_checkpoint_args(parser)
    add_distributed_args(parser)
    add_ema_and_diag_args(parser)
    return parser


def get_generation_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser("s2st_tpu-generate")
    add_common_args(parser)
    add_task_args(parser)
    add_model_args(parser)
    add_criterion_args(parser)  # weights decide which aux heads exist
    add_generation_args(parser)
    return parser


def parse_training_args(argv: Optional[List[str]] = None):
    return _two_pass(get_training_parser(), argv)


def parse_generation_args(argv: Optional[List[str]] = None):
    return _two_pass(get_generation_parser(), argv)


# keys a generation CLI owns even when the checkpoint carries a config
# echo: where/what to decode and how to batch it are run-time choices,
# everything architectural comes from training time
_GEN_CLI_KEYS = frozenset({
    "data", "task", "path", "gen_subset", "train_subset", "valid_subset",
    "config_yaml", "results_path", "user_dir", "max_tokens", "batch_size",
    "max_sentences", "num_workers", "seed", "scoring", "beam", "nbest",
    "model_overrides", "skip_invalid_size_inputs_valid_test",
    "required_batch_size_multiple", "source_lang", "target_lang",
})


def model_args_from_checkpoint(args: argparse.Namespace,
                               ) -> argparse.Namespace:
    """Namespace for MODEL-BUILDING at inference time.

    fairseq parity: checkpoint_utils.load_model_ensemble (:250-280)
    rebuilds each model from the checkpoint's own saved config
    (state["cfg"]/"args"), which is why run_baseline.sh stages 7/10/11
    pass no architecture flags at all. Here the checkpoint's embedded
    flag echo (cli/train.py save_meta) overrides the CLI namespace for
    every key except the run-time ones in _GEN_CLI_KEYS;
    --model-overrides (a python-dict literal) wins over both. Returns
    the CLI namespace unchanged for torch .pt/.bin checkpoints or
    checkpoints that predate the config echo.

    Use with ``task_args_scope`` so the override applies only while the
    model config is built — data loading keeps the CLI's choices."""
    path = (getattr(args, "path", "") or "").split(":")[0]
    overrides = {}
    raw = getattr(args, "model_overrides", None)
    if raw and raw.strip() and raw.strip() != "{}":
        import ast
        overrides = ast.literal_eval(raw)
    saved = None
    if path and not path.endswith((".pt", ".bin")):
        try:
            from .train.checkpoint import peek_meta
            saved = peek_meta(path).get("args")
        except Exception:
            saved = None
    if not saved and not overrides:
        return args
    merged = dict(vars(args))
    for k, v in (saved or {}).items():
        if k not in _GEN_CLI_KEYS:
            merged[k] = v
    merged.update(overrides)
    return argparse.Namespace(**merged)


class task_args_scope:
    """Temporarily swap ``task.args`` (e.g. for build_model_config /
    build_model_and_loss against a checkpoint-echoed namespace) and
    restore on exit."""

    def __init__(self, task, ns: argparse.Namespace):
        self.task, self.ns = task, ns

    def __enter__(self):
        self._old = self.task.args
        self.task.args = self.ns
        return self.task

    def __exit__(self, *exc):
        self.task.args = self._old
        return False


def parse_eval_lm_args(argv: Optional[List[str]] = None):
    """fairseq_cli/eval_lm.py flag surface over the generation parser."""
    parser = get_generation_parser()
    parser.add_argument("--output-word-probs", action="store_true")
    parser.add_argument("--context-window", type=int, default=0,
                        help="score each block with this many tokens of "
                        "trailing context from the preceding blocks "
                        "(fairseq_cli/eval_lm.py:244 + "
                        "lm_context_window_dataset.py semantics)")
    parser.set_defaults(task="language_modeling")
    return _two_pass(parser, argv)


# ---------------------------------------------------------------------------
# args -> typed configs
# ---------------------------------------------------------------------------

def build_model_config(args, src_vocab_size: int, tgt_vocab_size: int,
                       num_speakers: int = 0):
    import jax.numpy as jnp
    from .models.s2st_transformer import S2STConfig
    dtype = jnp.bfloat16 if (args.fp16 or args.bf16) else jnp.float32
    return S2STConfig(
        src_vocab_size=src_vocab_size,
        tgt_vocab_size=tgt_vocab_size,
        input_feat_per_channel=getattr(args, "input_feat_per_channel", 80),
        conv_kernel_sizes=tuple(
            int(k) for k in args.conv_kernel_sizes.split(",")),
        conv_channels=args.conv_channels,
        encoder_layers=args.encoder_layers,
        encoder_embed_dim=args.encoder_embed_dim,
        encoder_ffn_embed_dim=args.encoder_ffn_embed_dim,
        encoder_attention_heads=args.encoder_attention_heads,
        encoder_normalize_before=True,   # recipe always passes it
        middle_layers=tuple(int(x) for x in str(args.middle_layers).split(",")
                            if x != ""),
        decoder_layers=args.decoder_layers,
        decoder_embed_dim=args.decoder_embed_dim,
        decoder_ffn_embed_dim=args.decoder_ffn_embed_dim,
        decoder_attention_heads=args.decoder_attention_heads,
        decoder_normalize_before=True,
        output_frame_dim=args.output_frame_dim,
        n_frames_per_step=args.n_frames_per_step,
        prenet_layers=args.prenet_layers,
        prenet_dim=args.prenet_dim,
        prenet_dropout=args.prenet_dropout,
        postnet_layers=args.postnet_layers,
        postnet_conv_dim=args.postnet_conv_dim,
        postnet_conv_kernel_size=args.postnet_conv_kernel_size,
        postnet_dropout=args.postnet_dropout,
        ctc=getattr(args, "ctc_weight", 0.0) > 0.0,
        aux_asr=getattr(args, "asr_ce_weight", 0.0) > 0.0,
        aux_st=getattr(args, "st_ce_weight", 0.0) > 0.0,
        middle_layers_decoder=tuple(
            int(x) for x in str(getattr(args, "middle_layers_decoder", "")
                                ).split(",") if x != ""),
        ctc_tgt=getattr(args, "ctc_weight_tgt", 0.0) > 0.0,
        asr_decoder_layers=args.asr_decoder_layers,
        asr_decoder_embed_dim=args.asr_decoder_embed_dim,
        st_decoder_layers=args.st_decoder_layers,
        st_decoder_embed_dim=args.st_decoder_embed_dim,
        num_speakers=num_speakers,
        speaker_embed_dim=args.speaker_embed_dim,
        speaker_embed_dim_dec=args.speaker_embed_dim,
        dropout=args.dropout,
        attention_dropout=args.attention_dropout,
        activation_dropout=args.activation_dropout,
        encoder_layerdrop=getattr(args, "encoder_layerdrop", 0.0),
        activation_fn=args.activation_fn,
        no_scale_embedding=args.no_scale_embedding,
        max_source_positions=args.max_source_positions,
        max_target_positions=args.max_target_positions,
        use_hubert=args.use_hubert,
        hubert_hidden=getattr(args, "hubert_hidden", 768),
        hubert_layers=getattr(args, "hubert_layers", 12),
        hubert_ffn=getattr(args, "hubert_ffn", 3072),
        hubert_heads=getattr(args, "hubert_heads", 12),
        dtype=dtype,
        remat=getattr(args, "checkpoint_activations", False),
        vocab_parallel_embed=getattr(args, "vocab_parallel_embed", False),
        use_flash_attention=getattr(args, "use_flash_attention", False),
    )


def build_loss_config(args):
    from .train.losses import LossConfig
    return LossConfig(
        bce_pos_weight=args.bce_pos_weight,
        use_guided_attention_loss=args.use_guided_attention_loss,
        guided_attention_loss_sigma=args.guided_attention_loss_sigma,
        label_smoothing=args.label_smoothing,
        ctc_weight=args.ctc_weight,
        ctc_weight_tgt=getattr(args, "ctc_weight_tgt", 0.0),
        asr_ce_weight=args.asr_ce_weight,
        st_ce_weight=args.st_ce_weight,
        l1_loss_weight=args.l1_loss_weight,
        mse_loss_weight=args.mse_loss_weight,
        eos_loss_weight=args.eos_loss_weight,
        attn_loss_weight=args.attn_loss_weight,
        alignment_lambda=getattr(args, "alignment_lambda", 0.05),
        sentence_avg=args.sentence_avg,
        nsp_loss_weight=getattr(args, "nsp_loss_weight", 1.0),
        masked_lm_only=getattr(args, "masked_lm_only", False),
    )
