"""Command line front-ends.

- ``python -m video_coding_tpu.cli.model_cli`` — codec CLI (parity with
  reference jpeg/bin/model.ml: decode frame/header/log, encode frame/log),
  plus ``--engine tpu`` to run the accelerated runtime.
- ``python -m video_coding_tpu.cli.oyuv`` — YUV tools CLI (parity with
  reference tools/bin/oyuv.ml: play / convert / compare).
"""
