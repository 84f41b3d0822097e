from . import midi_io, pianoroll
