"""Compatibility shim: the reference exposes ``from get_model import Model``
(reference ``get_model.py:10``); this framework's implementation lives in
``image2video_synthesis_using_cinns_tpu.models.facade``."""

from image2video_synthesis_using_cinns_tpu.models.facade import Model

__all__ = ["Model"]
