tok7 tok16 tok4 tok36
tok27 tok24 tok1 tok31 tok6 tok13 tok24 tok30 tok28
tok17 tok28
tok1 tok1 tok20 tok6 tok37
tok0 tok34
tok35 tok31 tok28 tok14 tok33 tok1 tok27 tok13
tok18 tok29 tok14 tok14 tok22
tok35 tok26
tok7 tok18 tok11
tok37 tok18 tok19 tok12 tok32 tok27 tok32
tok11 tok26 tok25 tok15 tok30 tok2 tok37 tok25 tok32
tok10 tok6 tok32 tok28 tok5 tok23 tok35
tok37 tok39 tok19 tok2 tok30 tok1 tok31 tok23
tok35 tok34 tok12 tok0 tok14 tok32 tok10 tok10
tok22 tok36 tok22 tok32 tok25
tok35 tok33 tok8 tok32 tok24 tok0 tok38 tok35 tok17
tok36 tok23 tok30 tok3 tok27
tok26 tok22 tok31 tok26 tok32
tok29 tok21 tok39 tok39 tok34 tok34 tok0
tok11 tok14
tok2 tok16 tok35 tok5
tok28 tok1 tok5
tok15 tok17
tok4 tok18 tok22 tok11 tok39 tok7
tok10 tok33 tok16 tok10
tok7 tok30 tok31 tok20 tok29 tok18
tok24 tok19
tok13 tok32 tok16 tok6 tok16 tok12 tok26
tok28 tok10 tok2 tok9 tok25 tok1 tok14 tok1
tok25 tok1 tok33 tok14 tok28 tok33 tok14 tok34
tok19 tok3 tok13 tok8 tok19 tok3 tok27
tok19 tok19 tok4
tok8 tok16 tok36 tok26
tok2 tok35
tok32 tok39 tok10 tok29 tok36
tok12 tok24
tok31 tok12 tok37 tok27 tok36 tok13 tok6
tok32 tok18 tok24
tok20 tok12 tok10 tok1 tok18 tok25 tok39 tok20 tok1
tok17 tok13 tok27 tok21
tok22 tok35 tok24
tok34 tok10 tok10 tok8 tok5 tok2 tok4 tok15 tok34
tok16 tok32 tok38 tok21 tok17
tok31 tok38 tok15 tok18 tok7 tok21 tok21
tok20 tok6 tok35 tok37
tok4 tok26
tok4 tok24 tok37 tok39 tok7 tok21 tok8 tok9
tok18 tok23 tok17 tok5 tok36
tok6 tok17 tok29
tok0 tok18
tok26 tok5
tok15 tok12 tok2
tok27 tok6 tok10 tok15 tok10 tok28 tok7 tok10
tok13 tok6 tok20 tok30 tok16 tok35 tok18 tok34
tok28 tok20 tok38 tok18 tok0 tok1 tok2
tok7 tok29 tok38 tok20 tok4 tok4 tok25 tok20
tok16 tok22 tok30 tok34 tok39 tok13
tok12 tok19 tok13 tok34
tok28 tok5 tok17 tok5 tok23
tok14 tok21 tok36
tok15 tok19 tok37 tok20 tok11 tok20 tok2 tok19
tok15 tok5 tok38 tok37 tok39 tok34 tok6
tok17 tok4 tok25 tok15 tok1
tok0 tok1 tok4
tok32 tok6 tok9 tok30 tok31 tok22
tok20 tok9 tok9 tok11 tok11 tok32 tok4
tok13 tok8 tok18 tok38 tok32 tok6
tok39 tok20 tok2 tok34
tok10 tok34 tok27 tok19 tok11
tok16 tok15
tok35 tok27 tok28
tok25 tok0 tok29 tok34 tok28 tok34
tok1 tok36 tok26 tok1 tok31 tok16 tok10
tok37 tok22
tok16 tok8 tok8 tok37
tok5 tok39 tok11 tok25 tok36 tok25
tok20 tok33 tok11 tok0 tok31
tok35 tok21 tok26 tok14 tok30 tok31 tok20 tok15 tok14
tok10 tok23 tok32 tok4 tok3 tok14
tok23 tok35 tok19 tok19 tok19
tok7 tok5 tok38 tok29
tok31 tok3 tok36 tok13 tok27 tok16 tok9 tok11
tok5 tok33 tok2 tok34 tok10 tok32 tok24 tok22
tok5 tok39 tok8 tok5 tok17 tok6
tok39 tok8 tok28 tok20 tok10 tok25 tok27 tok24 tok15
tok17 tok18 tok7 tok26 tok34 tok38 tok27 tok7 tok13
tok33 tok12 tok0 tok35 tok24
tok18 tok11 tok13 tok16 tok15 tok38 tok1 tok1 tok37
tok19 tok17 tok12 tok34
tok26 tok31 tok22 tok34 tok10 tok28
tok24 tok36 tok13
tok36 tok7 tok1 tok6 tok18
tok18 tok34
tok36 tok23 tok32 tok4
tok0 tok20 tok33 tok22 tok32 tok27
tok22 tok28 tok28
tok7 tok31 tok36 tok21 tok25 tok34
tok12 tok32 tok38 tok17 tok0 tok35 tok13 tok24
tok12 tok33 tok39 tok28 tok10 tok19 tok26 tok33 tok38
tok21 tok25 tok27 tok37 tok24 tok0 tok33
tok18 tok15 tok31
tok9 tok26
tok26 tok16 tok22 tok0 tok38 tok4 tok11 tok17
tok29 tok10 tok31 tok16 tok29 tok9
tok32 tok17
tok4 tok27 tok37
tok5 tok10 tok32 tok10 tok1 tok28 tok4
tok21 tok15 tok13 tok33 tok13 tok19 tok38 tok17
tok32 tok29 tok23 tok33 tok4 tok4
tok19 tok10
tok25 tok35 tok25 tok14 tok39 tok22
tok21 tok39 tok16 tok30
tok39 tok1 tok15 tok39 tok16
tok37 tok10 tok4 tok12 tok17 tok15 tok27 tok20
tok8 tok8 tok10 tok33 tok29 tok16 tok38 tok9 tok37
tok6 tok4 tok19 tok13 tok7 tok15 tok25 tok19 tok23
tok11 tok6 tok31 tok20 tok25
tok38 tok3
tok2 tok13
tok6 tok11 tok39 tok7 tok17 tok21 tok28 tok39 tok33
tok24 tok28 tok31 tok14 tok25
tok29 tok18 tok15 tok14
tok13 tok7 tok37 tok31 tok21 tok16 tok28 tok13
tok0 tok0 tok2
tok1 tok9 tok10 tok25 tok12 tok18 tok37 tok24 tok20
tok9 tok24
tok24 tok36
tok2 tok0 tok19 tok29 tok5 tok8
tok8 tok33
tok7 tok17
tok28 tok12 tok17 tok8 tok31 tok1 tok12 tok5
tok37 tok37 tok3 tok15 tok15 tok16 tok17 tok21
tok35 tok38 tok27 tok22
tok35 tok22
tok4 tok39 tok17 tok4 tok27 tok34 tok12 tok34
tok27 tok13 tok3 tok9 tok6 tok11
tok5 tok3
tok28 tok2 tok34 tok8 tok2 tok20 tok6 tok23 tok32
tok33 tok1 tok28 tok25
tok2 tok19 tok5 tok20 tok16 tok5
tok19 tok7 tok24 tok16 tok8 tok20 tok16 tok3
tok32 tok15 tok27
tok37 tok25 tok32 tok21 tok21
tok1 tok34 tok33 tok37 tok35 tok33 tok28 tok8 tok6
tok20 tok33 tok24 tok23 tok12 tok10
tok8 tok22 tok26
tok34 tok19 tok2
tok33 tok20 tok17 tok22 tok20 tok19 tok26
tok7 tok33
tok36 tok20 tok20 tok20
tok30 tok17 tok28
tok31 tok33 tok3 tok8 tok3 tok37 tok5 tok24 tok23
tok25 tok23 tok23 tok21 tok36 tok15
tok10 tok32 tok34 tok21 tok38 tok29
tok16 tok9
tok26 tok11 tok7 tok8 tok36
tok34 tok6
tok33 tok36 tok4 tok16 tok13 tok6
tok11 tok13 tok4
tok38 tok12 tok14 tok18 tok31 tok23 tok37 tok1
tok16 tok4 tok30 tok12 tok34 tok23 tok28 tok27 tok15
tok25 tok4 tok31 tok32 tok24 tok34 tok0 tok12
tok34 tok0 tok19 tok12 tok0 tok29 tok22 tok2
tok20 tok32 tok19
tok38 tok26 tok33 tok34 tok26 tok33
tok37 tok28 tok32 tok8 tok19 tok28
tok0 tok16 tok10 tok35
tok5 tok1 tok18 tok25 tok26 tok23 tok2 tok36
tok17 tok24 tok0
tok22 tok30 tok7 tok29 tok24 tok21 tok30 tok23 tok17
tok11 tok1 tok9 tok26
tok16 tok26 tok18 tok37 tok8 tok23
tok13 tok31 tok21 tok27 tok17 tok26
tok1 tok14 tok9 tok13 tok8 tok4 tok5 tok27 tok25
tok30 tok9 tok16
tok0 tok11 tok25
tok3 tok39 tok27
tok6 tok3 tok22 tok27 tok34
tok5 tok13 tok3 tok30 tok11 tok17 tok16 tok7
tok38 tok7 tok25 tok31 tok32 tok18 tok28 tok7
tok26 tok16 tok33 tok10 tok12 tok39 tok24 tok9 tok6
tok31 tok21 tok39 tok13 tok34 tok31
tok17 tok22 tok0
tok28 tok34
tok15 tok17 tok17 tok32 tok14 tok6
tok3 tok38 tok35 tok26 tok12 tok16 tok8 tok9
tok30 tok17 tok17 tok26
tok38 tok23 tok31 tok13 tok31 tok17
tok9 tok34 tok28 tok37 tok11 tok38 tok11 tok21 tok15
tok20 tok32
tok31 tok39 tok20 tok13
tok3 tok34 tok5 tok14 tok16 tok8 tok8 tok7 tok21
tok12 tok36 tok14 tok7
tok39 tok19 tok1 tok0 tok20 tok27
tok17 tok21 tok17 tok14 tok5
tok9 tok16 tok7 tok8 tok22 tok21 tok7 tok1
tok4 tok22
tok20 tok19 tok6
tok1 tok23 tok3 tok33 tok17
tok23 tok25 tok8
tok32 tok0 tok17 tok21 tok6
tok5 tok25 tok17 tok38 tok8 tok22 tok7
tok8 tok35 tok19 tok14 tok19 tok25 tok34 tok26 tok36
tok32 tok38
tok13 tok15 tok11
tok16 tok33 tok17 tok34 tok16 tok1 tok34 tok17
tok35 tok34 tok23 tok34 tok4 tok23 tok6 tok25 tok8
tok19 tok39
tok23 tok21 tok30 tok13 tok9 tok37 tok4 tok9 tok8
tok7 tok25 tok28 tok24 tok9 tok10
tok0 tok38 tok18 tok17
tok24 tok8
tok27 tok1 tok29
tok6 tok3 tok29 tok38 tok25 tok26 tok23 tok17
tok22 tok32 tok33 tok8 tok37 tok7 tok2 tok0 tok2
tok15 tok39 tok15 tok30 tok22 tok36
tok10 tok22 tok35
tok27 tok20 tok2
tok22 tok24 tok26 tok27 tok39 tok3 tok16
tok9 tok33 tok39 tok15 tok28 tok21
tok7 tok21
tok7 tok21 tok31 tok34
tok13 tok30
tok15 tok21 tok21 tok15 tok6 tok14 tok25 tok11
tok7 tok34 tok25 tok28 tok27 tok12 tok31 tok23 tok30
tok4 tok1 tok6 tok26 tok24 tok0 tok9 tok8 tok17
tok18 tok32 tok24 tok29
tok16 tok6 tok33 tok9
tok25 tok29
tok15 tok34 tok0 tok25 tok34
tok10 tok35 tok34 tok4 tok15 tok21 tok11 tok10
tok32 tok1 tok37 tok24
tok12 tok33 tok2 tok15 tok27
tok29 tok25 tok15
tok24 tok3 tok36
tok30 tok6 tok35
tok15 tok33
tok19 tok1
tok28 tok34 tok20 tok35 tok8 tok38 tok10 tok26 tok17
tok23 tok17 tok31 tok12 tok24 tok25 tok10 tok35
tok11 tok17 tok36 tok16
tok9 tok21 tok23
tok36 tok17 tok24 tok22 tok16 tok16
tok34 tok37 tok4 tok12 tok14 tok16 tok8 tok9 tok0
tok8 tok36 tok15 tok27 tok34
tok24 tok25 tok1 tok3 tok9 tok4 tok5 tok12 tok25
tok15 tok4 tok34 tok34 tok8 tok38 tok37 tok8
tok19 tok14 tok11 tok22 tok25 tok12 tok18 tok8
tok18 tok34 tok31 tok22
tok13 tok19 tok32
tok16 tok28 tok23 tok39 tok6 tok37 tok39 tok18 tok1
tok20 tok3
tok27 tok7 tok6 tok8
tok7 tok25 tok32 tok32 tok13
tok16 tok37 tok8 tok33 tok24
tok12 tok7
tok35 tok10 tok2 tok17 tok14 tok39 tok34 tok30
tok17 tok25 tok26 tok17 tok26
tok13 tok31 tok2 tok29 tok1 tok35 tok11 tok8 tok6
tok28 tok27 tok2 tok4 tok6 tok15 tok21 tok34
tok32 tok12 tok32 tok38 tok11
tok21 tok4 tok37 tok23 tok14 tok12 tok23 tok33
tok2 tok29
tok2 tok30 tok18 tok9
tok5 tok25 tok36
tok3 tok30 tok22 tok17 tok25 tok19 tok36 tok32
tok35 tok37 tok38 tok9 tok20 tok37 tok19 tok27 tok1
tok33 tok25 tok26 tok23 tok38 tok4
tok37 tok36
tok33 tok36 tok2
tok21 tok6
tok31 tok4 tok37 tok23 tok2 tok35 tok23
tok21 tok28 tok34
tok20 tok10
tok25 tok6 tok37 tok9 tok37 tok9 tok13
tok23 tok38 tok16 tok21 tok23 tok26 tok32
tok15 tok4
tok5 tok39 tok36 tok18 tok35 tok25
tok26 tok17 tok10
tok35 tok18 tok8
tok3 tok30 tok17 tok6 tok13 tok15
tok21 tok20 tok35 tok4 tok34 tok13
tok2 tok23 tok28 tok2 tok8 tok33
tok26 tok20
tok33 tok37 tok2 tok35
tok32 tok37 tok8 tok37 tok7 tok14 tok12 tok11
tok12 tok29 tok17
tok29 tok23
tok2 tok31 tok0 tok0 tok14 tok22 tok39
tok0 tok2 tok35 tok16
tok33 tok2 tok11 tok33 tok5
tok31 tok15 tok18 tok28 tok13
tok12 tok11 tok38 tok12 tok4 tok25 tok20
tok1 tok23 tok30 tok39 tok27 tok37
tok4 tok21 tok21 tok37 tok27 tok39 tok36 tok6 tok1
tok30 tok32 tok35 tok36 tok38 tok31 tok32 tok12
tok38 tok25 tok36 tok19 tok33 tok17 tok10 tok30 tok38
tok29 tok2 tok38 tok0 tok19 tok16
tok24 tok9 tok21 tok30 tok13 tok28 tok32 tok14 tok22
tok19 tok3 tok34 tok16 tok0 tok22 tok7 tok3
