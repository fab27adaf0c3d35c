"""Ray-Data-native schema + constraint validation engine.

Generalizes the repair-or-reject contract of mangiucugna/json_repair into a
distributed validation engine over Arrow tables of audio-clip + transcript
pairs: per-row tolerant JSON repair, column statistics, uniqueness /
referential / drift checks, and verdict + violation outputs — all expressed as
``ray.data.Dataset`` pipelines.
"""

__version__ = "0.1.0"
