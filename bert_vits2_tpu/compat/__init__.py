"""Reference-compat layer: config.json HParams, PyTorch checkpoint import.

Lets a fishaudio/Bert-VITS2 user bring their config.json + G_*.pth checkpoints
to the TPU framework unchanged (SURVEY.md §7 step 9).
"""

from bert_vits2_tpu.compat.hparams import HParams, get_hparams_from_file
from bert_vits2_tpu.compat.torch_import import (
    convert_state_dict,
    import_dur_disc_checkpoint,
    import_generator_checkpoint,
    import_mpd_checkpoint,
    import_wavlm_disc_checkpoint,
    load_torch_checkpoint,
)

__all__ = [
    "HParams",
    "get_hparams_from_file",
    "convert_state_dict",
    "load_torch_checkpoint",
    "import_generator_checkpoint",
    "import_mpd_checkpoint",
    "import_dur_disc_checkpoint",
    "import_wavlm_disc_checkpoint",
]
