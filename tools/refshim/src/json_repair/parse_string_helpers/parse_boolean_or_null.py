def parse_boolean_or_null(parser):
    return parser.literal_token()
