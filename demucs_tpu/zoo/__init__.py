"""Model zoo: checkpoint bridge from the reference ``.th`` format + native repo."""
