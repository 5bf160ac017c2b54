"""A third-party --user-dir plugin (the extension surface the reference's
whole S2ST product rides on: fairseq/utils.py:462-507 import_user_module →
examples/s2s_trans registers its tasks/models/criterions out-of-tree).

This package lives OUTSIDE s2st_tpu/ and registers a task and an arch by
name; the CLIs must drive it end-to-end given only
``--user-dir <this dir> --task toy_translation --arch toy_transformer``.
"""

from s2st_tpu.registry import (register_arch, register_criterion,
                               register_task)
from s2st_tpu.tasks.translation import TranslationTask

PLUGIN_LOADED = True


@register_task("toy_translation")
class ToyTranslationTask(TranslationTask):
    """Out-of-tree task: translation with a marker the test can observe."""

    toy_marker = "third-party"


@register_arch("toy_transformer")
def toy_transformer(args):
    """Out-of-tree arch: test-scale transformer defaults."""
    from s2st_tpu.options import ARCH_REGISTRY
    ARCH_REGISTRY["transformer_tiny"](args)
    args.encoder_layers = 1
    args.decoder_layers = 1
    return args


@register_criterion("toy_cross_entropy")
class ToyCrossEntropy:
    """Registered for registry-surface completeness (the translation task
    wires its loss through build_model_and_loss, as in-tree tasks do)."""
