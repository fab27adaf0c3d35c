from engine.repair.strings import _classify_value_comma, _track_container


def classify_object_value_comma(parser, cached_skip_to_character=None):
    find = cached_skip_to_character or parser.find_unescaped
    return _classify_value_comma(parser, find)


def update_inline_container_stack(char, pending_inline_container, inline_container_stack):
    return _track_container(char, pending_inline_container, inline_container_stack)
