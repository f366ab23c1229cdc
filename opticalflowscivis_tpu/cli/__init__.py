"""Command-line entry points (reference L5 drivers).

Verbs mirror the reference CLIs:
  train            ⇔ Flow-2D/train.py --mode=train / Flow-3D/train.py
  test             ⇔ Flow-2D/train.py --mode=test (batch inference + report)
  inference_img    ⇔ Flow-2D/inference_img.py
  inference_video  ⇔ Flow-2D/inference_video.py (multi-factor interpolation eval)
  train_upflow     ⇔ UPFlow/scripts/simple_train.py
  generate         ⇔ Datasets/create_rectangle_2d.py etc. (dataset production)
  bench            ⇔ Flow-2D/benchmark/testtime.py

Run: ``python -m opticalflowscivis_tpu.cli <verb> [flags]``.
"""
