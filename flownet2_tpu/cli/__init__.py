"""Command-line entry points.

- ``run_flownet`` / ``run_flownet_many`` — the reference inference contract
  (scripts/run-flownet.py, run-flownet-many.py) with identical positional
  arguments and byte-compatible .flo output.
- ``train`` — the ``caffe train`` brew command (solver config + -weights /
  -snapshot, tools/caffe.cpp:154-226).
- ``test`` — scores a net over a dataset (tools/caffe.cpp:229-300).
- ``time`` — per-stage forward/backward timing (tools/caffe.cpp:302-388).
"""
