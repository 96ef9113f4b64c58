"""Host-side entropy coding: native rANS + scene bitstream codec."""
