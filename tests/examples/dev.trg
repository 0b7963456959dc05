tok5 tok5
tok2 tok38 tok13 tok38 tok16 tok19 tok10
tok23 tok32 tok25 tok27
tok27 tok24 tok20 tok29 tok23 tok1 tok2 tok17 tok32
tok14 tok15 tok11 tok35
tok20 tok11
tok23 tok32 tok32 tok8
tok23 tok33 tok26 tok28
tok15 tok33 tok29 tok25 tok10 tok28 tok23
tok36 tok22 tok29 tok29 tok22 tok32 tok32 tok31 tok17
tok19 tok19 tok30 tok17 tok39 tok10 tok20 tok14 tok31
tok21 tok4 tok39 tok23 tok32 tok31 tok13 tok19
tok6 tok12
tok3 tok36
tok17 tok8 tok33 tok6 tok14 tok37
tok3 tok2 tok27 tok3 tok13
tok4 tok7 tok5 tok1 tok15 tok11 tok23
tok1 tok2
tok24 tok0 tok33 tok11 tok10 tok8 tok16
tok9 tok15
tok22 tok0
tok31 tok21 tok18
tok28 tok19
tok25 tok16
