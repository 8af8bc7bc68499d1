"""Sources & sinks (SURVEY.md §7 step 6): file-replay streaming source
(tests/bench twin) and the live SSE DataSource for Wikimedia EventStreams.
"""
