"""Source readers: CSV / fixed-width / COPY text / DBF / inline,
multi-file expansion, and archive handling (SURVEY §2.1)."""
