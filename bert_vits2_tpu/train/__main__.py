"""CLI training entry (reference: `torchrun train_ms.py`; here
`python -m bert_vits2_tpu.train -c config.json -m model_dir`).

Multi-host TPU slices need no torchrun: each host runs this same command and
JAX picks the topology from the environment (train_ms.py:56-81's env:// setup
is replaced by jax.distributed).
"""

from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser(description="Train Bert-VITS2 on TPU")
    p.add_argument("-c", "--config", required=True, help="config.json path")
    p.add_argument("-m", "--model", required=True, help="model/log directory")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--keep-ckpts", type=int, default=8)
    p.add_argument("--n-model", type=int, default=1,
                   help="model-parallel axis size of the device mesh")
    p.add_argument("--no-dur-disc", action="store_true")
    p.add_argument("--slm-path", default="auto",
                   help="WavLM weights dir for the SLM adversarial losses "
                        "(train_ms.py:344-356); default resolves config.json "
                        "model.slm.model")
    p.add_argument("--no-slm", action="store_true",
                   help="train WITHOUT the SLM/WavLM losses (diverges from "
                        "reference v2.3 training)")
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() before anything else")
    args, _ = p.parse_known_args()

    if args.multihost:
        import jax

        jax.distributed.initialize()

    from bert_vits2_tpu.train.trainer import Trainer

    trainer = Trainer(
        args.config,
        args.model,
        use_dur_disc=not args.no_dur_disc,
        n_model=args.n_model,
        slm_path=None if args.no_slm else args.slm_path,
    )
    trainer.run(
        epochs=args.epochs,
        max_steps=args.max_steps,
        keep_ckpts=args.keep_ckpts,
    )


if __name__ == "__main__":
    main()
