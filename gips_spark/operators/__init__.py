"""Engine operators (SURVEY.md §2 inventory), each a DataFrame→DataFrame
composition — Catalyst plans them; the only Python is inside Arrow UDFs."""
