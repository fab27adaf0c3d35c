def parse_json_llm_block(parser):
    return parser.fenced_block()
