"""Test harness: run everything on a virtual 8-device CPU mesh.

Real TPU hardware is single-chip (and remote-compiled) in this environment;
the test suite runs on XLA's host platform with 8 virtual devices so the
multi-chip sharding paths compile and execute for real (SURVEY.md §4e).

Note: a sitecustomize pre-imports jax with the TPU plugin, so plain env vars
are too late — use jax.config.update before any backend is initialized.
"""
import os

import jax

jax.config.update("jax_platforms", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
