"""Training loops and step builders."""
