"""mqdet_tpu CLI tools.

A real (non-namespace) package: tests import the reference tree by
prepending /root/reference to sys.path (tests/ref_harness.py), and the
reference repo also ships a top-level ``tools/`` directory. Without this
__init__.py both directories merge into one namespace package and the
reference's modules shadow ours. A regular package anywhere on sys.path
takes precedence over namespace portions, so this file pins ``tools.*``
to this repo.
"""
