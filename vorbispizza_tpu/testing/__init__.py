"""Test-support utilities: native oracle (libvorbisfile) and vector
synthesis (libvorbisenc). Never imported by the decode pipeline itself."""
