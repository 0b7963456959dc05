mid t75 t74 t22 t42 t14 t78 t48 t75 t66 t72
short t36 t22 t2 t18 t79 t40
mid t73 t73 t15 t32 t40 t59 t75 t61
short t34 t67 t23 t15 t22 t18
short t43 t12 t73 t39 t69
short t36 t3 t24 t73
short t34 t74 t13 t37
short t38 t12 t28
long t40 t24 t11 t41 t36 t19 t35 t77 t64 t52 t73 t40
short t22 t53 t41 t42
long t62 t10 t56 t55 t55 t14 t41 t55 t28 t2 t49
short t4 t12 t56 t28 t69 t39
mid t13 t26 t24 t15 t59 t15 t54 t23
mid t17 t59 t55 t24 t43 t49 t61 t2 t34
mid t46 t35 t73 t73 t19 t72 t52 t36 t37 t23
long t7 t12 t28 t58 t5 t41 t70 t10 t28 t54 t25
long t67 t11 t74 t16 t57 t60 t54 t2 t62 t14 t18
short t49 t36 t33 t79
mid t58 t66 t74 t45 t8 t67 t77 t23
long t75 t70 t73 t41 t16 t26 t79 t59 t46 t3 t20 t70 t28 t44 t9
short t38 t19 t58 t30 t65
long t69 t57 t66 t63 t19 t33 t42 t10 t40 t10 t70 t23
mid t33 t49 t56 t71 t20 t72 t17
long t16 t48 t12 t48 t33 t7 t30 t47 t59 t50 t41 t31 t47 t34
long t76 t16 t35 t68 t73 t77 t23 t26 t57 t29 t54 t8 t71
mid t75 t69 t61 t73 t35 t24 t20 t15 t34 t8
long t77 t4 t60 t79 t28 t27 t32 t10 t60 t29 t9 t57 t42
long t25 t10 t23 t65 t22 t54 t22 t3 t8 t54 t11 t10 t26 t53
mid t15 t23 t12 t11 t36 t2 t2 t0
mid t63 t38 t70 t61 t71 t27 t22
long t64 t68 t2 t61 t14 t16 t25 t0 t38 t38 t58
long t6 t41 t48 t46 t74 t42 t23 t16 t78 t51 t58 t59
mid t68 t9 t53 t2 t32 t5 t42 t5 t21
mid t21 t77 t0 t72 t77 t4 t37 t45 t48 t71
long t10 t57 t78 t69 t44 t64 t65 t74 t16 t72 t52
long t58 t52 t68 t46 t41 t51 t43 t43 t39 t18 t18 t69 t53 t20 t9
long t18 t67 t12 t51 t20 t10 t7 t12 t10 t16 t55 t57 t64 t23
long t7 t37 t72 t44 t11 t4 t25 t45 t53 t34 t31 t41
long t27 t23 t20 t2 t32 t53 t44 t18 t32 t16 t63 t53 t46
short t27 t41 t72
long t37 t53 t53 t30 t26 t1 t2 t7 t48 t76 t77 t15
short t15 t62 t45 t77 t79 t66
short t33 t62 t56 t16 t74
short t18 t43 t65
short t78 t48 t38 t68
long t29 t20 t18 t18 t1 t16 t7 t50 t13 t79 t53 t17 t46
short t38 t0 t3 t66 t15 t57
mid t9 t75 t70 t77 t34 t22 t38 t43 t23
short t75 t45 t44 t73 t8 t10
mid t31 t7 t57 t75 t9 t34 t49
mid t10 t75 t16 t29 t17 t41 t6 t49 t76 t37
long t51 t64 t45 t31 t32 t29 t20 t20 t6 t12 t61 t42 t48 t63
mid t19 t37 t60 t60 t12 t47 t35 t75 t34 t45
long t13 t3 t62 t33 t0 t42 t51 t5 t62 t23 t46 t48
mid t25 t9 t11 t75 t70 t9 t49 t7
mid t65 t70 t31 t72 t36 t31 t56 t45
short t48 t68 t67
mid t31 t3 t70 t4 t34 t54 t20
mid t77 t76 t43 t16 t29 t30 t28 t11 t64 t34
long t9 t65 t45 t17 t13 t16 t74 t33 t26 t27 t29 t14 t25 t61
long t18 t65 t8 t56 t26 t18 t32 t17 t24 t20 t37
long t11 t61 t61 t15 t3 t56 t30 t2 t32 t53 t41 t44 t13 t49
long t29 t39 t57 t59 t6 t26 t35 t64 t1 t40 t75 t3
long t64 t28 t3 t40 t22 t33 t7 t28 t35 t19 t73 t21 t59
mid t54 t7 t57 t78 t21 t0 t77
short t22 t43 t2 t18 t26 t73
long t3 t50 t17 t50 t33 t73 t54 t76 t63 t10 t7 t24
short t65 t22 t67 t77 t30
long t17 t11 t5 t32 t7 t11 t42 t58 t55 t64 t56 t12
long t16 t18 t2 t33 t33 t68 t53 t7 t73 t38 t73 t51 t58 t78 t74
short t44 t28 t13
mid t61 t79 t1 t11 t7 t30 t36
short t6 t35 t14 t1 t27
short t13 t63 t78 t11
long t48 t48 t66 t8 t66 t51 t9 t74 t40 t54 t46
mid t40 t11 t77 t56 t31 t25 t46 t63
mid t50 t47 t58 t63 t16 t71 t54 t57 t65 t29
long t10 t44 t10 t40 t46 t50 t53 t26 t60 t59 t52
mid t42 t1 t0 t61 t34 t62 t62 t61 t5 t0
short t4 t5 t29 t56 t75
short t30 t16 t53
long t24 t1 t16 t25 t18 t46 t77 t22 t4 t45 t18 t39 t64 t72
long t11 t34 t15 t40 t53 t17 t44 t21 t0 t39 t4 t23 t49
short t22 t78 t3 t36 t40 t67
short t12 t38 t75
short t64 t69 t77 t41 t7 t73
long t64 t36 t6 t78 t62 t30 t25 t40 t3 t27 t66 t56 t39 t21 t57
long t42 t44 t70 t78 t11 t56 t29 t79 t3 t28 t55 t74 t28
long t29 t73 t39 t71 t65 t13 t15 t50 t33 t18 t34 t3 t41
short t57 t30 t2 t56
long t23 t46 t5 t14 t25 t16 t53 t64 t52 t18 t8 t53 t44 t63 t2
long t69 t51 t44 t75 t48 t59 t64 t16 t65 t2 t30 t55 t77
mid t49 t42 t50 t55 t5 t3 t20 t20 t16 t77
short t30 t5 t50
short t38 t64 t67 t44 t54 t69
mid t23 t43 t35 t75 t25 t53 t60 t26 t5
long t29 t11 t69 t49 t30 t65 t36 t13 t13 t61 t51
long t32 t70 t62 t23 t71 t30 t54 t22 t24 t33 t42 t0 t57 t53
long t27 t10 t74 t19 t61 t42 t23 t23 t23 t50 t73 t64
mid t29 t72 t58 t24 t60 t39 t62 t0
short t76 t25 t64 t25 t75 t77
short t28 t66 t71 t6 t59
short t49 t3 t17 t36
short t59 t48 t2 t75 t40
mid t43 t38 t68 t64 t71 t0 t18 t14 t8
long t37 t21 t13 t50 t65 t20 t12 t36 t17 t36 t44
short t72 t44 t32 t53 t46
long t19 t15 t5 t30 t58 t72 t5 t43 t27 t61 t36
short t60 t49 t16 t41 t74 t46
mid t1 t27 t3 t34 t48 t77 t60 t72
mid t19 t76 t52 t19 t4 t25 t78
long t1 t52 t42 t47 t50 t36 t54 t53 t79 t36 t37 t24 t13
short t30 t22 t56 t12 t20
mid t76 t7 t12 t18 t79 t24 t58 t11 t9
short t30 t7 t1
mid t37 t62 t23 t12 t60 t29 t27
mid t38 t58 t65 t23 t15 t26 t42 t58 t38 t31
short t38 t44 t64 t4 t29 t32
short t17 t24 t2 t29
long t8 t33 t59 t64 t74 t7 t67 t66 t51 t19 t19 t73
short t45 t5 t27 t23
mid t43 t40 t79 t74 t50 t49 t6 t77
short t48 t17 t3 t19 t16
mid t4 t39 t73 t59 t21 t55 t66 t75 t29 t31
mid t43 t2 t46 t42 t71 t61 t30
short t49 t24 t5 t20
mid t10 t27 t52 t43 t25 t70 t53
short t15 t17 t56 t35 t4 t50
long t11 t71 t21 t66 t59 t71 t38 t0 t39 t47 t66 t1 t40 t24
short t21 t67 t39 t46 t73
long t21 t10 t51 t26 t4 t18 t72 t29 t53 t25 t66 t3
mid t13 t19 t23 t32 t8 t17 t15
mid t52 t28 t71 t23 t59 t32 t32 t61 t40
long t41 t38 t71 t42 t20 t15 t39 t48 t25 t54 t0
long t38 t48 t34 t60 t42 t40 t24 t1 t65 t4 t75 t4
short t50 t69 t49 t3
mid t56 t49 t5 t12 t51 t0 t48 t67 t46 t20
short t26 t18 t65 t10
long t6 t18 t43 t76 t24 t46 t10 t74 t12 t59 t20 t53 t28
long t30 t51 t65 t74 t38 t59 t35 t55 t66 t4 t1
mid t19 t39 t48 t5 t21 t62 t71
mid t37 t73 t48 t9 t3 t45 t62 t56 t42
short t79 t28 t59 t77 t29
long t9 t28 t40 t71 t3 t72 t11 t11 t13 t1 t8 t2
long t4 t33 t56 t23 t5 t34 t35 t50 t79 t26 t0 t76 t49 t8
long t34 t16 t10 t41 t21 t60 t74 t70 t63 t15 t52 t38 t71
long t42 t14 t4 t15 t54 t0 t33 t3 t56 t48 t9 t66
short t30 t34 t35 t21
mid t31 t26 t18 t54 t20 t40 t21
short t2 t12 t62 t0 t60 t69
mid t47 t33 t78 t56 t31 t5 t62 t26 t79 t73
long t70 t22 t17 t15 t36 t69 t14 t12 t62 t37 t41 t8 t13 t28 t50
mid t12 t22 t14 t36 t39 t47 t3
short t41 t28 t25 t77 t64
long t76 t16 t35 t24 t11 t44 t77 t63 t59 t0 t37 t79
short t55 t69 t72 t47 t0
mid t18 t30 t35 t8 t21 t49 t11
short t4 t29 t30 t3 t27 t13
mid t50 t20 t68 t19 t7 t0 t71
mid t3 t46 t49 t54 t74 t29 t48 t55
long t35 t57 t4 t48 t54 t74 t36 t57 t65 t28 t29 t50 t11 t10 t0
long t78 t37 t57 t18 t47 t45 t29 t20 t21 t67 t77 t47
short t23 t46 t4 t63 t10 t76
long t74 t50 t1 t59 t3 t27 t75 t36 t33 t61 t61 t19
mid t17 t67 t16 t46 t60 t22 t8 t60
long t79 t63 t31 t49 t74 t74 t75 t28 t71 t55 t77 t13 t41
long t60 t3 t22 t26 t9 t73 t3 t23 t44 t50 t55 t20 t52 t65 t34
mid t4 t3 t77 t19 t25 t75 t21 t73 t18 t71
mid t16 t54 t36 t52 t13 t79 t45
short t65 t79 t17 t65
long t46 t27 t19 t20 t78 t26 t50 t74 t71 t37 t47
long t31 t4 t73 t30 t20 t39 t19 t37 t26 t54 t23 t63
mid t21 t55 t31 t73 t8 t3 t38 t6 t52 t13
mid t26 t16 t58 t75 t65 t31 t2 t1
long t59 t23 t47 t25 t43 t48 t28 t44 t33 t1 t12 t3
mid t36 t21 t2 t30 t71 t38 t62 t36
short t34 t8 t15
mid t9 t78 t50 t71 t54 t35 t15
mid t69 t34 t10 t5 t40 t72 t27 t4 t57 t31
short t42 t53 t63 t28
long t41 t59 t65 t45 t15 t18 t20 t63 t45 t7 t25 t27
long t12 t76 t24 t18 t6 t19 t1 t71 t66 t65 t43 t21
long t51 t75 t24 t49 t14 t14 t72 t28 t9 t34 t70 t71 t48
long t18 t28 t41 t39 t24 t71 t34 t4 t79 t47 t31 t64
short t0 t21 t27 t0
mid t67 t60 t53 t2 t59 t58 t62 t34
short t20 t69 t67
long t19 t7 t4 t64 t59 t3 t60 t7 t45 t10 t43
mid t70 t67 t26 t12 t24 t48 t79
long t35 t64 t72 t10 t55 t26 t5 t65 t41 t12 t63 t0 t58
short t62 t79 t45 t78
long t50 t1 t11 t6 t65 t69 t12 t4 t43 t14 t17 t65 t54 t63 t24
long t61 t32 t49 t12 t29 t46 t13 t41 t18 t72 t63
long t14 t20 t9 t79 t29 t73 t16 t47 t9 t60 t65
short t50 t39 t36 t56 t51
short t71 t22 t27
mid t33 t71 t17 t67 t62 t42 t2 t53 t26 t49
long t62 t75 t16 t62 t16 t66 t47 t11 t62 t23 t22 t49 t75 t24 t43
long t0 t52 t67 t72 t64 t28 t55 t2 t31 t52 t22 t9
short t45 t78 t52 t72 t47
mid t64 t51 t52 t72 t10 t51 t54
long t21 t37 t12 t68 t7 t60 t35 t14 t14 t13 t32 t41 t15
long t68 t56 t41 t36 t14 t71 t11 t3 t72 t49 t75 t48 t9 t61
long t75 t9 t22 t56 t78 t14 t29 t65 t65 t71 t5 t39 t4
long t65 t36 t25 t33 t30 t59 t64 t1 t2 t32 t48 t65
mid t33 t48 t15 t66 t45 t42 t46 t52 t45 t23
long t49 t69 t57 t23 t78 t48 t39 t75 t45 t35 t10
long t10 t37 t44 t59 t26 t36 t71 t31 t36 t49 t58
mid t7 t18 t53 t65 t77 t7 t6
short t44 t68 t56 t47
long t43 t10 t78 t9 t29 t13 t52 t50 t66 t32 t71 t57 t37 t68
short t39 t10 t7 t49 t0
mid t22 t60 t77 t51 t25 t71 t54
mid t48 t27 t66 t31 t59 t45 t53 t4 t57
short t1 t52 t22 t62
long t26 t72 t16 t2 t7 t18 t16 t39 t24 t11 t78 t17
short t49 t14 t73
short t44 t56 t44 t20 t72
long t18 t21 t25 t58 t2 t21 t2 t67 t47 t45 t18 t44 t41
mid t74 t39 t6 t62 t11 t63 t33 t46
long t8 t53 t77 t61 t11 t31 t46 t77 t46 t14 t46 t57
long t0 t72 t57 t53 t60 t71 t41 t66 t13 t75 t68 t9 t70
short t79 t15 t78
short t3 t8 t41
long t21 t77 t32 t11 t69 t42 t43 t76 t41 t44 t66 t79 t23 t49 t6
mid t29 t78 t12 t49 t59 t45 t59 t0 t42 t19
short t67 t1 t49
short t33 t24 t20 t27 t50
short t32 t19 t20
short t78 t61 t15 t62 t14
mid t58 t78 t49 t12 t55 t14 t15 t77 t66
long t53 t10 t11 t69 t78 t24 t1 t0 t34 t0 t77 t39
short t41 t50 t74 t65
short t26 t41 t34 t42 t36
mid t33 t22 t0 t72 t59 t75 t57 t27
mid t35 t54 t25 t56 t24 t31 t33 t59 t13 t54
mid t72 t48 t4 t56 t10 t33 t74 t61
mid t25 t56 t48 t23 t44 t49 t4 t46
mid t51 t69 t29 t6 t29 t56 t5
long t71 t59 t61 t4 t76 t9 t52 t2 t15 t24 t68 t15
long t44 t53 t69 t31 t63 t27 t36 t55 t77 t37 t51
mid t55 t75 t77 t52 t41 t51 t22 t16 t75 t70
mid t16 t46 t12 t40 t71 t31 t21 t31 t28 t74
short t79 t61 t28
short t4 t75 t78 t1 t49
short t10 t63 t14 t38
long t39 t53 t30 t67 t37 t17 t19 t27 t75 t7 t36
mid t58 t15 t6 t76 t37 t44 t15 t42 t2
mid t18 t68 t8 t14 t53 t23 t65 t5
long t31 t45 t67 t59 t20 t58 t19 t41 t67 t53 t27 t9 t9 t16
short t29 t52 t63 t4 t58
mid t24 t77 t44 t56 t73 t64 t78 t44
long t31 t1 t8 t50 t79 t61 t38 t66 t11 t54 t67
mid t25 t49 t56 t16 t59 t13 t15 t0 t29 t34
mid t28 t11 t57 t2 t6 t14 t50 t49 t40
short t23 t41 t10 t74 t58 t73
short t59 t2 t67 t43
long t14 t30 t25 t36 t72 t64 t55 t58 t31 t24 t18 t46 t9
short t70 t16 t56 t0 t49 t19
mid t1 t68 t75 t62 t16 t42 t13 t64
long t15 t9 t42 t63 t21 t64 t0 t34 t5 t31 t65 t74 t13
mid t48 t44 t61 t67 t0 t66 t47 t71 t49 t2
short t40 t30 t51 t6
long t12 t28 t49 t67 t71 t3 t58 t60 t57 t52 t14 t69 t23 t64 t26
long t49 t57 t54 t20 t61 t72 t45 t78 t50 t19 t54 t62 t28
mid t68 t65 t8 t31 t47 t45 t63 t64 t33 t21
long t46 t66 t22 t11 t44 t61 t18 t53 t57 t38 t48
mid t3 t33 t32 t39 t70 t1 t29 t65 t23 t21
mid t23 t37 t62 t38 t61 t63 t10 t74 t42 t9
mid t25 t5 t23 t12 t28 t60 t12
short t57 t37 t54 t61 t22
mid t10 t21 t70 t57 t52 t72 t14 t7 t42
short t70 t46 t41 t34 t38 t37
short t45 t24 t59 t44 t27 t14
long t5 t63 t42 t71 t10 t25 t41 t4 t56 t35 t63 t0 t64 t76
mid t12 t54 t24 t22 t77 t66 t77 t64
mid t8 t17 t3 t52 t62 t10 t40
long t57 t2 t60 t67 t5 t30 t12 t54 t10 t16 t55 t74 t43
long t50 t77 t33 t75 t66 t53 t38 t49 t66 t51 t17 t39 t74 t71
long t74 t45 t38 t76 t36 t40 t63 t55 t30 t21 t5 t18 t67
long t45 t16 t15 t13 t75 t64 t51 t39 t35 t51 t45
long t71 t21 t7 t15 t50 t15 t36 t35 t61 t45 t64 t54 t38 t79 t79
long t77 t13 t2 t52 t39 t5 t48 t27 t29 t69 t71 t42 t74 t2 t25
mid t71 t74 t4 t16 t55 t31 t15 t53
mid t65 t24 t76 t40 t17 t57 t64 t57 t31
mid t51 t76 t49 t8 t1 t53 t68 t5 t54 t30
mid t9 t5 t23 t3 t33 t13 t22 t9 t47 t66
mid t4 t54 t74 t62 t47 t78 t33
long t2 t7 t21 t7 t11 t25 t49 t3 t35 t61 t71 t64 t28 t30
mid t14 t0 t78 t13 t42 t51 t37 t30 t25
long t46 t25 t48 t43 t50 t21 t18 t14 t54 t63 t23 t15
mid t65 t61 t29 t53 t59 t19 t1
mid t51 t5 t63 t39 t70 t27 t50 t0 t19 t43
mid t47 t1 t20 t24 t65 t20 t13 t41
mid t9 t63 t31 t20 t30 t29 t34 t70 t24 t5
mid t68 t40 t65 t58 t39 t73 t54 t0 t7 t57
short t78 t78 t13 t0
mid t66 t7 t55 t73 t47 t14 t45
short t12 t47 t52 t38
mid t75 t70 t7 t46 t41 t42 t5 t73
short t18 t16 t44 t39
short t79 t73 t10 t64 t30 t78
long t42 t40 t1 t57 t19 t63 t73 t78 t36 t77 t75
long t13 t26 t13 t4 t1 t78 t29 t27 t9 t4 t54 t26
short t54 t39 t7
long t76 t52 t75 t25 t70 t8 t21 t10 t50 t39 t53 t26
mid t21 t79 t35 t38 t30 t15 t14 t57 t18
long t20 t44 t11 t29 t39 t59 t53 t72 t51 t54 t1
long t12 t4 t47 t22 t61 t77 t20 t5 t70 t66 t44
long t19 t29 t72 t69 t75 t45 t62 t77 t65 t65 t23 t51 t25 t54
long t75 t40 t3 t18 t58 t59 t46 t66 t45 t23 t72 t68 t9
mid t41 t71 t15 t58 t66 t79 t27 t63 t19
mid t66 t7 t51 t58 t48 t17 t45 t18
mid t6 t72 t10 t71 t18 t38 t0 t57 t49 t75
long t39 t24 t12 t23 t23 t64 t0 t43 t74 t40 t37 t39 t69
short t71 t79 t14
mid t43 t17 t24 t35 t52 t62 t63 t43
short t44 t49 t57 t68 t16 t38
long t53 t30 t73 t74 t29 t62 t8 t78 t57 t9 t29 t67
short t13 t59 t10 t31 t23 t49
long t9 t29 t66 t46 t29 t51 t72 t11 t79 t49 t33 t73 t23
long t32 t7 t34 t26 t9 t54 t46 t0 t23 t8 t39 t10
long t37 t55 t18 t39 t50 t61 t33 t7 t49 t33 t63 t45 t54 t9
long t68 t70 t78 t63 t66 t5 t29 t5 t39 t53 t67 t43
short t10 t78 t0 t25
long t27 t54 t33 t54 t46 t52 t52 t61 t8 t52 t27 t66 t56 t35 t56
long t39 t0 t54 t5 t13 t3 t69 t31 t34 t3 t42 t40 t0
long t18 t45 t26 t67 t42 t53 t56 t27 t69 t28 t77 t22 t55 t39 t73
long t1 t40 t31 t74 t42 t20 t17 t4 t64 t41 t72 t42
short t77 t10 t3 t54 t48 t46
mid t39 t45 t41 t37 t4 t6 t7 t0 t39 t7
short t68 t52 t1 t49 t45 t64
long t48 t41 t24 t63 t25 t73 t53 t18 t43 t68 t40 t34 t61 t22 t49
short t11 t43 t28 t0 t71
long t49 t16 t23 t21 t77 t59 t17 t0 t7 t36 t24 t75 t22
short t66 t75 t8 t64
mid t28 t22 t12 t54 t27 t51 t44
mid t72 t63 t37 t79 t42 t20 t49 t49 t50
short t73 t44 t76 t17 t14 t76
long t1 t36 t61 t41 t14 t45 t46 t27 t22 t44 t3 t35 t58
long t35 t56 t65 t1 t1 t24 t25 t31 t27 t75 t5 t7 t26 t62
long t53 t2 t26 t21 t16 t73 t46 t76 t0 t73 t28 t73
short t35 t57 t47 t59 t77 t5
long t22 t24 t59 t16 t29 t70 t36 t44 t47 t49 t17 t62
long t13 t48 t76 t5 t23 t37 t41 t27 t50 t68 t74 t10 t70
short t40 t54 t54 t49
mid t35 t78 t35 t24 t4 t73 t53
long t46 t17 t63 t56 t51 t2 t1 t79 t37 t8 t54 t54 t8
short t42 t48 t28 t79 t38 t17
long t60 t58 t37 t23 t1 t78 t16 t26 t58 t52 t0 t60
short t1 t11 t54
long t19 t29 t67 t29 t77 t49 t74 t54 t49 t47 t0 t76 t11 t60 t28
mid t28 t4 t45 t13 t0 t39 t38 t1 t37 t68
short t35 t7 t68
short t12 t36 t39
mid t3 t22 t42 t10 t13 t30 t52 t19
mid t59 t73 t29 t66 t2 t24 t59 t64 t49 t12
long t16 t58 t25 t19 t28 t58 t12 t3 t54 t64 t61 t8 t35 t8
mid t24 t39 t48 t49 t30 t17 t37 t78 t12
long t15 t73 t9 t79 t19 t1 t62 t50 t56 t66 t62
mid t6 t61 t67 t17 t74 t61 t15
long t45 t52 t19 t32 t51 t57 t60 t72 t52 t7 t79 t51 t24 t64
mid t4 t58 t16 t47 t2 t58 t2
short t73 t49 t3 t29
mid t63 t7 t57 t1 t24 t60 t74
mid t77 t23 t67 t41 t5 t50 t41
mid t29 t16 t33 t3 t25 t36 t52 t56 t13 t33
mid t57 t31 t59 t30 t67 t16 t54 t18 t50
long t47 t70 t65 t49 t45 t49 t37 t17 t51 t57 t25 t10 t25 t58
mid t41 t40 t35 t27 t32 t29 t0 t56
long t39 t66 t40 t74 t11 t13 t64 t13 t62 t1 t64 t2 t16
long t17 t9 t76 t39 t30 t0 t17 t57 t40 t23 t35 t70 t36 t65 t62
short t5 t36 t5
short t61 t30 t24 t77
mid t17 t6 t74 t63 t56 t27 t31 t79 t2
long t22 t11 t16 t32 t72 t38 t35 t32 t36 t50 t75 t77 t20 t9 t35
long t1 t13 t3 t66 t61 t21 t3 t11 t58 t44 t36 t33 t53 t1
long t2 t67 t26 t54 t42 t22 t26 t77 t7 t39 t14 t76 t45 t43 t21
long t11 t77 t20 t13 t55 t21 t42 t4 t7 t29 t15
mid t53 t58 t56 t61 t7 t79 t3 t1
mid t35 t37 t72 t60 t45 t60 t17 t12 t70 t66
long t50 t12 t54 t44 t69 t38 t7 t69 t46 t8 t20 t30 t79 t50
long t54 t69 t30 t56 t37 t8 t46 t42 t38 t30 t60 t75
short t30 t41 t2 t45 t37
long t35 t52 t56 t76 t21 t25 t60 t25 t59 t50 t70 t25 t73
short t18 t17 t18
mid t50 t68 t79 t25 t27 t71 t34 t34 t3
mid t31 t34 t72 t55 t68 t5 t6
short t6 t11 t19 t10 t69 t58
short t25 t31 t57
short t11 t65 t34 t31 t12 t7
short t34 t7 t48 t47 t51
long t34 t13 t27 t38 t17 t10 t28 t72 t73 t36 t44 t47 t5 t73 t45
long t21 t66 t64 t53 t40 t67 t58 t32 t61 t23 t16 t68
short t2 t47 t34 t18 t62 t67
long t40 t62 t54 t23 t56 t2 t43 t25 t31 t20 t73 t78 t9
long t40 t22 t54 t52 t72 t45 t4 t24 t69 t71 t76
short t67 t63 t54 t55 t0 t66
mid t45 t3 t62 t27 t13 t55 t39 t43 t70
long t39 t16 t34 t76 t26 t18 t57 t0 t54 t79 t0 t32
long t8 t15 t13 t17 t61 t5 t30 t63 t35 t67 t75
mid t41 t64 t64 t73 t15 t72 t62 t27 t36 t59
mid t28 t14 t60 t30 t10 t35 t25 t71 t67 t77
long t73 t49 t33 t36 t78 t42 t38 t29 t37 t10 t51
short t24 t22 t69
short t4 t76 t79
mid t27 t46 t70 t71 t74 t3 t73 t58
long t25 t32 t50 t77 t37 t69 t44 t29 t49 t79 t75 t48 t45 t53
long t52 t6 t17 t42 t1 t39 t46 t70 t24 t66 t25 t5 t32 t31 t23
mid t25 t50 t4 t53 t77 t12 t77 t72 t2
short t22 t76 t32 t12 t18 t75
long t65 t25 t62 t65 t59 t24 t75 t19 t24 t34 t9 t7 t38
long t15 t5 t38 t35 t70 t33 t24 t78 t50 t50 t68 t50 t60
mid t55 t29 t71 t45 t37 t10 t57 t78 t36 t51
long t40 t72 t5 t2 t7 t27 t38 t36 t64 t43 t31 t75 t77 t2
long t51 t19 t6 t21 t76 t68 t2 t41 t21 t12 t75 t79
mid t72 t2 t61 t31 t18 t5 t7 t39 t28
short t27 t62 t32 t26 t61
short t19 t9 t62 t61 t77
mid t32 t25 t23 t54 t70 t40 t59 t22
long t4 t3 t23 t43 t9 t11 t73 t40 t24 t49 t5 t41
short t35 t43 t70 t64
mid t68 t57 t46 t42 t42 t18 t64 t12 t21
long t12 t52 t6 t21 t53 t3 t13 t41 t12 t75 t12 t30 t54 t23 t16
long t74 t44 t29 t45 t24 t7 t65 t17 t74 t60 t21 t6 t75
long t66 t56 t61 t39 t55 t6 t2 t2 t9 t53 t43 t58 t36
short t60 t21 t34 t51
long t19 t62 t64 t33 t24 t53 t57 t36 t42 t17 t17 t13
mid t22 t31 t63 t2 t54 t27 t55 t37
mid t50 t26 t10 t9 t54 t77 t74
mid t70 t73 t4 t25 t48 t35 t24
long t35 t31 t23 t78 t73 t26 t25 t5 t18 t79 t65 t22 t6 t3
short t41 t12 t7 t68 t43 t40
long t78 t72 t9 t66 t25 t69 t11 t56 t35 t26 t73 t32 t3
long t61 t15 t45 t43 t7 t26 t39 t55 t75 t54 t21
long t34 t1 t72 t76 t53 t34 t52 t73 t4 t9 t6 t19
short t50 t78 t32 t22
long t7 t46 t77 t23 t62 t28 t72 t15 t60 t35 t40 t75 t37
short t16 t35 t58
short t22 t64 t51
short t50 t45 t25 t50 t19
mid t15 t58 t18 t10 t68 t78 t60
short t8 t78 t70 t29 t78
long t50 t20 t27 t55 t44 t76 t63 t38 t17 t74 t54 t73 t14 t31 t3
long t19 t28 t68 t19 t31 t0 t44 t3 t77 t15 t2 t7 t20 t38 t46
long t51 t2 t57 t62 t38 t19 t40 t64 t44 t26 t63 t66 t70
long t0 t54 t73 t71 t60 t21 t25 t43 t77 t5 t68 t0 t21 t50
long t44 t59 t33 t39 t10 t70 t3 t42 t78 t0 t34 t74 t28 t10
long t39 t5 t62 t77 t45 t59 t22 t63 t42 t77 t72 t74
mid t30 t48 t24 t27 t45 t53 t48 t10 t36
mid t63 t73 t64 t60 t10 t30 t18 t69 t8 t40
mid t72 t58 t57 t26 t50 t77 t75 t6
mid t73 t21 t73 t34 t26 t54 t6 t67 t51 t9
long t41 t46 t14 t13 t20 t66 t23 t65 t69 t53 t47 t69
mid t27 t18 t30 t29 t64 t47 t7 t35
mid t46 t54 t66 t73 t16 t0 t15 t4 t68
short t4 t30 t40 t62
long t73 t78 t5 t3 t75 t6 t31 t63 t58 t58 t55 t56 t51 t54 t74
short t8 t60 t63 t2 t29
long t43 t18 t66 t68 t73 t68 t56 t25 t20 t74 t0 t67 t5 t55 t67
long t45 t9 t49 t23 t37 t77 t77 t55 t72 t31 t68
mid t49 t6 t56 t26 t20 t13 t26 t70 t41 t56
mid t58 t3 t13 t38 t25 t77 t1 t11 t55
long t37 t66 t44 t34 t16 t1 t59 t64 t21 t23 t23 t56
long t71 t79 t79 t13 t54 t52 t3 t13 t49 t64 t38 t55 t44
short t70 t51 t72 t5 t41
short t0 t51 t0 t19 t4 t64
long t62 t36 t72 t38 t52 t49 t64 t60 t79 t63 t25 t28 t11 t50
long t11 t69 t52 t72 t43 t36 t41 t4 t13 t56 t67 t78 t0
short t77 t26 t16 t51 t67
long t27 t31 t9 t57 t48 t11 t0 t44 t66 t41 t7 t11 t4 t64
short t17 t68 t12 t64
short t4 t43 t26 t35 t58 t11
long t61 t30 t74 t33 t49 t70 t11 t15 t26 t45 t52
mid t71 t5 t73 t71 t9 t22 t34 t57
mid t19 t73 t37 t78 t15 t7 t48 t74 t52
short t76 t25 t50 t4 t53
long t4 t44 t42 t4 t42 t11 t73 t2 t34 t10 t78 t73 t35 t49 t9
long t74 t14 t23 t45 t33 t54 t44 t5 t19 t71 t56 t53 t4 t52 t74
short t23 t10 t12
long t34 t71 t7 t78 t74 t60 t10 t74 t61 t46 t76 t42
short t72 t72 t27 t69 t38 t51
mid t62 t32 t51 t23 t65 t29 t22 t56 t76 t50
mid t69 t22 t46 t72 t12 t44 t47
long t57 t66 t32 t69 t25 t11 t22 t75 t8 t65 t1 t30 t69
mid t55 t25 t75 t30 t62 t17 t54 t69
long t58 t35 t37 t36 t59 t39 t65 t72 t52 t68 t59
long t28 t39 t44 t37 t3 t77 t64 t5 t22 t63 t40 t33 t22 t16 t1
long t41 t1 t10 t6 t55 t48 t55 t34 t73 t12 t2 t50
mid t55 t1 t35 t76 t5 t66 t24 t2 t62
mid t41 t47 t24 t67 t45 t78 t56 t16 t1 t59
long t39 t76 t36 t29 t21 t1 t46 t17 t49 t78 t41
mid t9 t25 t8 t30 t50 t64 t60 t44 t56
mid t25 t59 t56 t18 t30 t35 t0
short t61 t74 t50 t45 t17
long t12 t64 t57 t21 t40 t47 t46 t22 t65 t21 t23
mid t70 t54 t14 t43 t29 t42 t42 t66 t43
short t26 t68 t33 t21 t31 t66
short t69 t19 t31 t17 t15 t32
short t52 t57 t23 t50
