long t57 t72 t66 t18 t20 t17 t18 t25 t70 t16 t65 t5 t7 t43 t4
mid t1 t8 t37 t76 t12 t12 t62 t61 t36 t9
short t32 t10 t68 t9 t9 t11
short t13 t22 t74 t7 t8
short t52 t67 t65
long t20 t18 t71 t63 t37 t36 t62 t47 t26 t51 t57 t24
mid t74 t59 t47 t65 t66 t18 t17 t53 t42 t44
long t25 t69 t27 t64 t6 t74 t41 t51 t53 t56 t16 t3 t33
long t48 t19 t46 t76 t34 t41 t73 t19 t8 t48 t75 t76 t55 t64
short t54 t69 t51 t63 t63
long t72 t31 t75 t69 t59 t50 t45 t23 t16 t39 t48
short t67 t27 t55 t79
long t48 t40 t75 t61 t63 t77 t75 t19 t57 t43 t5 t61 t19 t50
short t75 t66 t11 t37
long t54 t6 t8 t34 t35 t46 t71 t76 t33 t14 t52 t7 t22 t42 t21
mid t34 t42 t69 t24 t79 t57 t1 t13 t73 t20
mid t53 t22 t31 t36 t66 t36 t34 t69 t67
short t28 t43 t39 t56 t28
short t7 t23 t7 t77 t73
long t27 t22 t40 t35 t15 t38 t29 t35 t60 t21 t67 t55 t49
mid t33 t42 t65 t55 t1 t53 t38 t36 t28 t12
mid t8 t10 t13 t53 t64 t70 t32
short t77 t35 t76 t51 t57 t36
long t1 t22 t18 t76 t50 t70 t24 t7 t61 t56 t8 t74 t60 t4
long t47 t52 t22 t45 t64 t40 t77 t45 t19 t44 t51 t7 t66
mid t69 t12 t4 t14 t63 t14 t32 t63 t70
mid t76 t21 t67 t45 t55 t66 t29 t61 t10
long t22 t24 t30 t78 t40 t4 t25 t60 t2 t54 t31 t62 t28
long t51 t19 t30 t6 t25 t70 t73 t58 t9 t18 t17
short t3 t39 t7 t44 t50
mid t70 t37 t53 t30 t43 t76 t12
long t33 t9 t39 t51 t22 t8 t68 t42 t63 t22 t4 t4
long t50 t29 t15 t10 t76 t32 t69 t48 t41 t47 t4 t50 t10
mid t59 t25 t46 t43 t49 t73 t19 t24 t58 t5
long t40 t23 t15 t0 t73 t43 t23 t53 t43 t76 t77 t60 t52 t23
long t9 t62 t79 t30 t59 t53 t41 t55 t71 t0 t12
long t3 t46 t39 t16 t36 t37 t9 t28 t46 t39 t61
mid t16 t40 t52 t49 t16 t40 t3
short t21 t50 t2
mid t70 t74 t18 t46 t15 t21 t43 t36 t38 t15
short t7 t55 t43 t28
long t18 t19 t10 t70 t16 t50 t14 t13 t0 t75 t75 t2 t42 t74 t36
mid t67 t10 t35 t63 t63 t69 t78 t3 t75
short t53 t52 t38 t21 t17 t17
long t31 t32 t74 t60 t33 t36 t62 t11 t52 t52 t32 t32 t3
short t10 t11 t8 t43
mid t71 t53 t37 t75 t46 t3 t79 t50
long t65 t43 t60 t39 t12 t8 t2 t51 t76 t39 t17 t70 t58 t44
long t55 t26 t32 t26 t40 t15 t42 t61 t12 t55 t8 t75
mid t32 t3 t20 t22 t21 t71 t40 t38
long t66 t7 t62 t69 t70 t29 t70 t51 t66 t78 t21 t71
mid t15 t64 t45 t11 t72 t34 t68 t77 t67 t76
mid t26 t6 t23 t19 t55 t16 t28 t56 t58
long t31 t35 t71 t40 t39 t12 t6 t67 t30 t5 t46 t19 t76 t23 t9
short t76 t8 t43 t71 t28
mid t15 t53 t15 t37 t28 t69 t9 t61
mid t38 t47 t10 t14 t10 t17 t54 t32
long t57 t62 t67 t9 t48 t16 t46 t18 t47 t20 t36 t61 t30 t78 t55
short t31 t16 t6 t33 t41 t39
mid t63 t13 t0 t39 t8 t26 t27 t46 t29
long t52 t22 t11 t66 t18 t34 t11 t52 t23 t53 t12 t16 t40 t61 t36
mid t39 t43 t44 t39 t60 t29 t15 t24 t36
mid t74 t4 t63 t49 t62 t28 t61 t17
short t35 t73 t42 t60
short t11 t39 t25
mid t69 t19 t73 t62 t43 t0 t25 t10 t40
mid t25 t13 t75 t56 t70 t69 t77 t5
long t51 t45 t54 t60 t17 t42 t47 t55 t63 t4 t43 t77 t49
mid t41 t70 t18 t48 t59 t70 t28 t46 t6
short t71 t24 t44
short t53 t79 t8 t15
long t43 t6 t64 t74 t79 t46 t66 t60 t46 t52 t31 t45 t23
long t29 t32 t60 t24 t5 t21 t53 t39 t37 t37 t77 t0 t43 t40
mid t58 t46 t65 t10 t1 t14 t66 t78 t20
short t5 t76 t2 t35
short t14 t52 t19
long t2 t41 t70 t74 t19 t56 t73 t26 t2 t66 t5 t3 t56 t62
short t63 t70 t1 t43 t71
mid t48 t6 t72 t11 t72 t45 t77 t66 t65
long t58 t8 t67 t56 t66 t67 t16 t73 t18 t55 t7 t67 t65
long t46 t30 t47 t73 t3 t48 t51 t21 t47 t58 t5 t58 t17 t22 t56
short t13 t46 t17 t3 t18 t51
short t35 t25 t19
mid t45 t17 t63 t30 t63 t13 t21
long t58 t12 t34 t66 t37 t26 t9 t20 t45 t17 t61 t40 t30 t47 t31
long t7 t43 t48 t65 t64 t29 t2 t10 t0 t52 t11 t3 t69 t37 t64
mid t46 t43 t58 t45 t38 t78 t63 t50 t2 t14
long t21 t8 t8 t51 t71 t71 t6 t48 t9 t78 t0
mid t14 t53 t31 t47 t7 t75 t47 t77
mid t7 t59 t35 t44 t73 t57 t37 t53 t74 t56
short t23 t23 t60 t52
short t76 t59 t16 t3
long t49 t72 t63 t41 t2 t63 t0 t32 t12 t45 t42 t27 t8 t12 t17
long t27 t32 t48 t79 t66 t62 t35 t69 t63 t15 t70 t37 t47 t1
long t23 t55 t61 t54 t58 t61 t16 t64 t63 t57 t47 t22 t18
mid t72 t51 t78 t33 t67 t46 t62
long t11 t40 t0 t69 t77 t63 t17 t75 t33 t67 t30
short t17 t31 t0 t4 t49
long t35 t10 t10 t29 t28 t14 t53 t51 t30 t2 t6 t69 t50 t0
mid t36 t16 t46 t37 t43 t54 t60
long t8 t69 t24 t19 t44 t16 t5 t43 t0 t44 t6 t79 t26
short t24 t61 t66
short t16 t11 t56 t67 t27
long t65 t57 t71 t52 t44 t60 t48 t2 t45 t40 t74 t33 t23
long t7 t66 t65 t64 t7 t3 t62 t34 t52 t57 t29 t45 t55 t63
short t20 t68 t9 t70 t46 t54
mid t63 t12 t20 t61 t61 t45 t16 t69 t43 t56
mid t42 t77 t13 t39 t67 t0 t1 t28
long t59 t20 t32 t0 t23 t28 t26 t25 t61 t21 t1 t3 t2
mid t38 t73 t25 t58 t30 t55 t0
long t2 t13 t72 t30 t67 t19 t10 t41 t49 t63 t76
mid t6 t60 t54 t9 t38 t21 t39 t16 t8
long t61 t2 t16 t46 t32 t64 t32 t54 t2 t45 t12 t68 t2
short t15 t0 t45 t41 t36 t53
long t57 t57 t57 t34 t12 t49 t27 t50 t30 t50 t42 t15
mid t50 t40 t66 t5 t7 t59 t72 t11 t39
short t58 t12 t58
mid t5 t56 t3 t79 t0 t73 t41 t1 t34
mid t30 t2 t30 t49 t79 t6 t65 t72
short t46 t73 t22
short t32 t11 t6 t12 t59 t25
mid t17 t1 t72 t32 t9 t62 t47 t72
short t70 t39 t30 t54 t57
long t12 t21 t1 t14 t45 t31 t14 t0 t29 t30 t2 t42 t30
long t52 t15 t43 t50 t70 t6 t63 t77 t26 t2 t51 t66 t54
mid t33 t71 t77 t76 t41 t76 t54
long t50 t44 t76 t58 t10 t47 t33 t23 t12 t67 t42 t39 t68
long t48 t73 t74 t59 t19 t73 t37 t49 t79 t32 t34 t79
short t16 t61 t27 t14
long t36 t66 t52 t2 t0 t27 t44 t28 t24 t31 t46 t13
short t72 t58 t27
mid t21 t43 t78 t66 t30 t15 t58 t78 t28
long t52 t59 t62 t7 t27 t52 t32 t25 t30 t12 t75 t77 t42 t13
short t50 t26 t44 t52 t48
short t54 t17 t8 t41
long t5 t73 t47 t25 t58 t22 t54 t15 t2 t46 t36
long t68 t5 t6 t20 t66 t70 t45 t7 t44 t51 t19 t19 t76 t66 t39
short t32 t25 t59
short t73 t53 t35 t49
mid t75 t69 t19 t73 t40 t56 t61 t59 t27
short t41 t50 t67 t63
long t48 t76 t23 t57 t17 t65 t17 t74 t24 t34 t43 t22
long t44 t36 t40 t41 t27 t20 t71 t69 t43 t40 t6 t43 t64
short t15 t39 t5 t3
short t45 t64 t12 t63
long t17 t23 t55 t12 t1 t78 t36 t70 t59 t71 t34 t62
short t26 t48 t9 t25 t47
long t54 t59 t2 t77 t43 t15 t69 t31 t7 t60 t10 t25 t33 t22 t31
mid t79 t54 t79 t78 t42 t60 t72 t10 t69
mid t62 t22 t51 t9 t6 t24 t71
mid t52 t74 t42 t13 t51 t41 t16 t22
long t31 t36 t20 t74 t33 t74 t68 t5 t24 t69 t57 t45 t68 t58 t10
short t1 t53 t13
mid t29 t75 t64 t61 t29 t79 t18 t53 t26
long t29 t63 t49 t43 t21 t45 t63 t35 t2 t47 t16 t29 t68 t26
mid t53 t22 t60 t21 t44 t6 t63 t29
long t75 t34 t29 t34 t67 t39 t23 t39 t11 t54 t40 t50
long t3 t35 t2 t54 t17 t70 t20 t15 t31 t19 t70 t16 t74 t33
short t0 t48 t70 t37 t68 t23
mid t36 t8 t64 t6 t53 t47 t16 t76 t61 t69
long t24 t6 t2 t45 t61 t7 t36 t57 t63 t55 t17 t8 t63 t77 t22
long t42 t9 t3 t31 t0 t7 t2 t77 t60 t34 t48
long t78 t62 t74 t43 t59 t49 t60 t2 t77 t29 t32 t49 t8 t47 t31
long t23 t33 t49 t35 t6 t65 t19 t69 t45 t35 t68 t20 t66
short t59 t20 t39 t61 t13 t51
short t55 t79 t69
long t61 t17 t50 t70 t8 t53 t8 t59 t52 t51 t57 t29 t61 t21 t59
mid t62 t10 t40 t77 t28 t50 t57 t58
short t36 t40 t60 t31 t19 t30
long t58 t16 t28 t58 t66 t34 t78 t18 t36 t31 t50 t79 t18 t17
short t64 t49 t42 t54 t75 t17
long t7 t77 t28 t73 t49 t52 t12 t47 t49 t76 t11 t9 t30 t27 t27
mid t36 t23 t33 t16 t52 t21 t40 t64 t23
short t21 t19 t71 t21 t40
long t57 t11 t37 t2 t78 t10 t50 t69 t40 t71 t41 t22
short t40 t21 t3 t35 t65
short t57 t67 t2
long t27 t20 t28 t28 t44 t8 t7 t62 t66 t1 t26 t36 t54
short t52 t64 t30 t52 t12
mid t6 t29 t60 t49 t73 t50 t62 t71
mid t10 t38 t39 t53 t15 t43 t19
mid t27 t24 t41 t78 t12 t16 t27 t59 t3 t76
mid t44 t78 t17 t0 t44 t78 t9 t77
long t47 t31 t45 t63 t63 t21 t72 t28 t14 t4 t40 t75
mid t7 t30 t70 t58 t13 t42 t59
long t7 t4 t73 t27 t70 t73 t48 t44 t42 t47 t23 t6
long t66 t14 t59 t75 t29 t79 t26 t52 t32 t54 t23
mid t59 t9 t59 t23 t28 t71 t77 t26
long t68 t63 t37 t62 t22 t5 t12 t10 t24 t15 t47 t46
short t30 t44 t38
short t59 t75 t15
mid t50 t20 t75 t0 t62 t72 t22 t75 t67
mid t43 t75 t62 t15 t15 t2 t56
long t63 t10 t22 t77 t25 t45 t27 t75 t17 t59 t53 t13 t47
short t59 t59 t13 t25
short t13 t64 t29 t78 t70
short t9 t55 t46 t29 t58 t54
long t29 t79 t67 t41 t22 t19 t63 t26 t73 t0 t73 t59 t73 t38 t43
long t68 t11 t54 t78 t0 t78 t74 t70 t77 t6 t15 t23 t49
long t10 t57 t4 t77 t23 t60 t51 t40 t58 t60 t42 t25 t75 t13
long t69 t10 t26 t70 t39 t65 t61 t56 t76 t21 t38 t63 t61 t23 t31
mid t47 t1 t41 t39 t75 t52 t16 t51 t25 t66
short t10 t62 t52
long t24 t12 t64 t54 t68 t33 t50 t34 t16 t79 t31 t46
mid t54 t79 t18 t38 t45 t40 t70
mid t22 t17 t19 t79 t58 t52 t27
mid t62 t16 t54 t50 t48 t31 t18
short t45 t52 t15 t67 t36 t41
long t3 t2 t42 t77 t16 t25 t66 t50 t45 t62 t30 t0 t74
short t72 t50 t71 t68 t61
short t46 t3 t14 t14 t43 t42
short t4 t58 t15 t54 t13
short t8 t42 t30 t2 t31 t75
mid t52 t54 t39 t48 t55 t37 t34 t35
long t44 t64 t23 t20 t42 t43 t68 t11 t48 t41 t13 t11 t9 t56 t50
mid t70 t44 t36 t37 t18 t9 t32 t49
long t10 t20 t60 t66 t37 t15 t8 t59 t49 t51 t62
long t61 t77 t39 t27 t43 t4 t1 t48 t8 t39 t78 t2 t0
short t9 t25 t12 t44
long t3 t41 t24 t25 t0 t10 t6 t46 t29 t14 t69 t61 t19 t34 t8
short t28 t52 t38 t18
short t0 t4 t25 t62
short t24 t10 t22 t24 t75
mid t7 t34 t61 t51 t30 t49 t15 t50 t79
mid t48 t63 t68 t13 t57 t8 t8 t62 t14 t37
mid t36 t46 t5 t39 t19 t62 t58
mid t22 t54 t73 t14 t28 t9 t3
short t73 t51 t40 t64
short t27 t60 t19 t27 t11
long t4 t49 t43 t11 t18 t39 t48 t20 t60 t76 t26 t52 t14 t17
short t49 t28 t6 t65
long t36 t47 t4 t76 t32 t70 t47 t12 t60 t0 t20 t27 t75 t41
short t1 t27 t79 t18 t38 t11
long t70 t52 t79 t77 t72 t78 t49 t0 t56 t69 t20 t27 t20 t55 t68
long t56 t55 t79 t68 t65 t57 t56 t22 t61 t0 t6 t32
long t44 t72 t52 t49 t47 t25 t36 t72 t44 t74 t33 t6 t57 t5
mid t72 t41 t44 t49 t0 t75 t6
long t36 t59 t34 t2 t61 t38 t11 t4 t29 t45 t78
long t40 t63 t25 t56 t9 t56 t56 t45 t25 t54 t60
short t46 t13 t28 t66 t29
long t15 t44 t48 t50 t26 t12 t5 t44 t7 t66 t64 t4 t17
long t6 t66 t49 t45 t36 t64 t65 t47 t65 t76 t64 t27 t16 t31
long t70 t58 t46 t10 t7 t13 t51 t70 t72 t1 t11 t79 t11 t34 t25
short t71 t27 t48
long t3 t44 t21 t2 t15 t41 t66 t39 t52 t20 t15 t10 t17 t77 t61
long t77 t11 t5 t0 t40 t1 t30 t78 t46 t0 t78 t40 t9 t26 t4
short t32 t70 t72 t52 t27 t48
long t2 t18 t51 t79 t51 t55 t59 t36 t39 t59 t18 t62 t60
short t69 t58 t62 t46
long t29 t75 t36 t6 t4 t26 t37 t36 t4 t21 t19 t71 t3
long t16 t31 t63 t78 t79 t27 t73 t73 t22 t37 t64 t17 t13 t56 t44
short t16 t11 t38 t43 t75 t32
long t15 t9 t65 t10 t44 t72 t6 t28 t26 t57 t66
long t76 t26 t54 t40 t10 t65 t72 t73 t19 t20 t58 t57
mid t3 t21 t42 t62 t6 t66 t14 t66 t36
long t13 t73 t59 t36 t43 t0 t12 t31 t50 t65 t12
mid t26 t0 t25 t25 t66 t6 t50 t59
short t51 t17 t53 t48 t26
long t65 t30 t60 t26 t25 t31 t50 t77 t5 t11 t67
mid t76 t19 t39 t59 t9 t48 t17 t56 t21 t31
long t54 t43 t13 t50 t16 t71 t53 t39 t55 t1 t42
mid t29 t72 t71 t27 t51 t21 t37 t37
short t7 t34 t16 t8 t46 t37
short t66 t35 t56
short t1 t33 t10
short t76 t53 t52 t69 t49 t76
mid t11 t47 t59 t4 t26 t7 t4 t30
long t28 t12 t61 t75 t5 t60 t12 t34 t15 t79 t10
long t20 t8 t29 t21 t9 t43 t50 t41 t0 t62 t8 t56 t69 t77 t63
short t15 t24 t8 t13 t0 t65
short t47 t64 t47 t49
mid t18 t45 t8 t12 t10 t78 t49 t54 t25 t71
mid t5 t65 t10 t71 t12 t58 t37 t71 t38
mid t45 t55 t28 t16 t78 t3 t64 t63
long t22 t8 t24 t44 t48 t76 t38 t30 t44 t2 t17 t6 t75 t11
mid t5 t73 t3 t72 t1 t29 t2 t4 t69
long t19 t30 t29 t52 t78 t30 t11 t38 t71 t12 t48 t71 t18
long t45 t59 t79 t22 t11 t57 t45 t59 t24 t53 t13 t7 t30
short t42 t16 t56 t42
short t17 t18 t16
mid t0 t70 t39 t43 t57 t62 t33
mid t14 t7 t73 t41 t25 t19 t36 t28 t52
mid t13 t11 t1 t2 t71 t17 t34 t28 t41
long t63 t67 t4 t22 t29 t73 t26 t17 t64 t22 t34 t57 t68
short t39 t19 t37 t12 t62 t11
short t49 t35 t12 t58
short t32 t6 t39 t67 t32 t79
long t56 t21 t62 t61 t64 t26 t43 t58 t49 t75 t43 t26
long t58 t78 t71 t32 t10 t66 t53 t39 t0 t19 t30 t71 t24 t46
long t26 t42 t51 t77 t35 t17 t77 t49 t8 t33 t37 t43
long t25 t61 t5 t30 t27 t56 t8 t0 t64 t28 t66 t30
short t55 t41 t0 t36
long t39 t42 t2 t66 t8 t4 t57 t19 t14 t58 t65 t25 t54
long t65 t47 t35 t35 t19 t65 t15 t75 t27 t71 t37 t29 t72 t21 t34
mid t24 t13 t36 t52 t66 t4 t11 t48 t68 t35
long t67 t5 t47 t40 t59 t69 t73 t11 t16 t34 t61 t24
short t72 t21 t56
mid t52 t64 t27 t53 t66 t26 t0 t14 t8
mid t49 t61 t35 t76 t20 t26 t31 t11
short t40 t35 t7
long t56 t28 t55 t1 t18 t46 t7 t45 t46 t31 t65 t53 t33 t33 t1
short t15 t54 t49 t5 t18 t9
mid t41 t66 t53 t64 t3 t60 t1
long t26 t76 t33 t50 t36 t54 t15 t3 t20 t55 t62 t51 t35
mid t57 t14 t24 t68 t60 t65 t4 t31 t59
long t50 t66 t54 t12 t70 t34 t43 t55 t49 t52 t44
long t42 t72 t45 t43 t54 t70 t25 t4 t74 t50 t4
short t15 t8 t29 t77 t78 t64
mid t0 t35 t51 t65 t4 t7 t65
short t43 t74 t10
short t14 t42 t68 t76 t49 t6
short t34 t27 t5 t53
short t56 t42 t43 t2 t53 t8
long t0 t76 t40 t55 t49 t33 t13 t73 t51 t42 t74 t57
short t61 t51 t33 t73 t17 t53
long t56 t26 t50 t24 t76 t44 t52 t4 t72 t60 t52 t14 t19 t66 t12
mid t4 t27 t12 t51 t75 t62 t64
mid t2 t63 t45 t29 t8 t59 t71
short t72 t36 t3 t71 t62
short t60 t46 t42 t20
long t34 t51 t31 t10 t57 t24 t77 t12 t30 t63 t45
long t17 t60 t74 t18 t32 t77 t45 t42 t74 t68 t9
short t6 t19 t73 t52
short t61 t67 t9 t75 t26 t61
long t18 t31 t23 t0 t62 t70 t16 t3 t0 t14 t74
mid t59 t26 t66 t77 t44 t72 t10 t20 t71
short t60 t77 t45 t46 t1 t54
long t65 t4 t23 t54 t11 t73 t52 t40 t54 t0 t35
long t65 t29 t29 t71 t50 t63 t71 t16 t2 t38 t15 t74 t65 t20 t10
long t14 t28 t66 t74 t54 t72 t76 t32 t38 t56 t63 t70 t25 t59 t11
long t77 t32 t19 t33 t75 t3 t60 t17 t47 t31 t27 t52 t54 t65
short t5 t58 t32 t54 t18
mid t3 t53 t52 t75 t37 t4 t41 t9
long t11 t51 t63 t43 t31 t34 t74 t10 t29 t15 t8
long t14 t14 t23 t70 t67 t58 t62 t42 t14 t48 t20 t5 t78
mid t54 t28 t71 t19 t25 t52 t60 t62 t20
long t32 t79 t2 t8 t33 t54 t26 t59 t57 t6 t12
short t54 t56 t50
long t40 t9 t46 t41 t47 t2 t19 t18 t59 t9 t66 t27 t70
mid t22 t25 t45 t17 t67 t70 t74 t78
long t42 t51 t27 t14 t63 t68 t25 t47 t10 t62 t33 t31 t39 t10
long t57 t25 t67 t19 t71 t32 t58 t32 t18 t52 t18 t24 t12 t20 t56
mid t45 t43 t56 t33 t52 t24 t79
mid t5 t3 t62 t25 t46 t72 t38
long t58 t15 t18 t66 t28 t33 t15 t18 t49 t27 t8 t50 t70 t26
mid t68 t0 t71 t55 t37 t6 t3 t50 t63
mid t48 t33 t77 t9 t18 t38 t67 t68
long t10 t3 t13 t63 t25 t30 t16 t78 t19 t12 t16 t26 t23 t79 t18
mid t17 t61 t37 t36 t17 t60 t65 t25 t34
short t79 t53 t74 t14 t60 t30
long t49 t32 t45 t42 t56 t67 t73 t51 t77 t45 t51 t6 t3 t16 t12
long t20 t55 t74 t62 t67 t17 t37 t53 t66 t3 t10
mid t25 t14 t3 t12 t78 t30 t51
short t66 t18 t75 t30
long t1 t22 t44 t33 t24 t19 t23 t67 t46 t40 t71 t51 t24 t69
short t78 t33 t55 t56 t72
mid t6 t21 t24 t78 t14 t74 t22 t40
short t24 t29 t14 t0
mid t39 t58 t58 t35 t20 t21 t24 t27 t1 t77
mid t29 t59 t76 t21 t45 t8 t16
short t3 t64 t3 t52 t21
long t30 t23 t49 t9 t19 t43 t10 t5 t56 t3 t64 t70
long t53 t8 t30 t48 t54 t2 t38 t5 t43 t14 t56 t63 t41
long t64 t27 t21 t11 t15 t17 t53 t63 t23 t32 t24
short t66 t61 t75 t11
mid t62 t74 t35 t64 t10 t69 t70 t10 t34 t19
mid t56 t6 t54 t34 t49 t75 t4 t39
mid t77 t69 t37 t30 t7 t20 t48 t74 t72 t30
short t36 t20 t63 t69 t49 t41
mid t34 t71 t25 t21 t58 t57 t67
short t71 t1 t75 t5 t60 t79
short t73 t48 t72 t73 t19 t25
long t19 t6 t16 t60 t65 t71 t46 t50 t42 t63 t55 t61 t65 t58
short t74 t19 t69 t74
mid t52 t76 t47 t59 t25 t52 t75 t76
long t15 t33 t20 t6 t49 t18 t79 t10 t24 t54 t66 t67 t24 t9
short t41 t66 t34 t20 t8 t78
mid t22 t14 t79 t10 t66 t57 t20 t47
short t30 t29 t36
long t21 t30 t39 t79 t52 t37 t23 t42 t4 t15 t65 t67 t37 t63
mid t11 t31 t68 t32 t40 t78 t14 t8 t76
mid t12 t52 t56 t69 t31 t28 t43 t44 t56
long t0 t42 t73 t9 t9 t10 t4 t49 t31 t9 t52 t53 t57 t78
mid t5 t21 t72 t63 t9 t63 t55 t78
short t2 t22 t16 t22
mid t28 t71 t48 t45 t53 t51 t20 t57 t40
short t28 t74 t9
mid t17 t53 t56 t4 t15 t8 t63 t36
long t47 t6 t48 t10 t68 t29 t47 t68 t10 t5 t3 t25 t15 t14 t67
mid t9 t58 t19 t78 t74 t69 t47 t20 t39
mid t72 t12 t0 t59 t8 t42 t20 t71 t23
short t23 t10 t11 t26
long t37 t4 t71 t7 t47 t10 t24 t31 t3 t12 t4
mid t30 t34 t56 t3 t58 t22 t44
mid t32 t41 t37 t43 t35 t46 t69 t13 t50 t22
mid t20 t65 t12 t73 t6 t30 t55 t79 t38
long t10 t33 t47 t29 t47 t31 t34 t45 t71 t56 t1 t3 t22 t30
short t8 t24 t17 t53 t31 t4
long t38 t29 t62 t29 t41 t25 t29 t70 t51 t45 t55 t38 t43 t29
short t55 t60 t78
short t69 t78 t59
short t25 t28 t12 t65 t52
long t42 t36 t62 t79 t63 t41 t46 t19 t45 t65 t65 t41 t28 t25 t25
long t66 t75 t63 t75 t71 t31 t66 t8 t72 t45 t10 t6 t46 t23 t65
mid t65 t61 t30 t32 t7 t64 t47 t2 t8 t27
short t39 t49 t31
short t15 t33 t37
short t32 t32 t23
long t27 t5 t35 t40 t45 t32 t19 t20 t63 t59 t60 t62 t57 t57
short t66 t61 t27 t29 t21 t50
short t77 t24 t37
short t10 t38 t54 t50
mid t56 t62 t27 t55 t69 t40 t44 t5 t11
mid t16 t23 t75 t20 t75 t73 t65
mid t36 t35 t35 t59 t55 t7 t65 t27
mid t77 t5 t24 t20 t50 t22 t42 t8 t78
short t12 t65 t33
long t68 t30 t48 t62 t5 t79 t38 t67 t51 t46 t37 t55 t29 t31 t26
long t2 t22 t59 t21 t55 t74 t66 t53 t24 t9 t21 t67 t43
mid t46 t2 t68 t49 t57 t75 t32 t22 t16
long t48 t31 t68 t42 t20 t6 t11 t55 t4 t13 t67 t47 t45 t54 t53
long t57 t53 t57 t20 t76 t61 t41 t77 t2 t9 t30
mid t33 t68 t18 t34 t36 t16 t9 t14
mid t45 t8 t51 t70 t55 t29 t44 t10 t66
mid t3 t60 t14 t71 t23 t78 t30
mid t6 t2 t70 t19 t25 t25 t37 t3 t56 t31
long t61 t22 t39 t32 t37 t66 t27 t38 t57 t62 t64 t26 t75 t6 t58
long t9 t68 t48 t11 t20 t50 t56 t28 t32 t41 t19 t28 t63
long t57 t55 t13 t41 t30 t34 t73 t50 t27 t27 t10
mid t48 t43 t46 t74 t7 t76 t63
short t79 t13 t9 t50 t44 t15
short t0 t26 t30 t79
mid t58 t47 t36 t0 t50 t49 t23 t1
short t46 t62 t33 t4 t10 t7
short t49 t72 t68
short t72 t23 t48
short t77 t53 t58 t22 t20 t9
long t24 t16 t13 t50 t0 t40 t46 t50 t57 t10 t30 t21
long t68 t58 t36 t12 t0 t7 t46 t59 t17 t64 t37 t34 t24 t71 t73
short t31 t16 t78
mid t27 t24 t10 t23 t68 t10 t55 t49
mid t18 t38 t10 t30 t10 t47 t4 t56
long t2 t11 t1 t7 t36 t14 t71 t19 t57 t16 t16 t20 t20 t6
long t17 t8 t72 t63 t54 t6 t57 t57 t17 t2 t45 t61 t78 t46 t56
long t25 t72 t2 t32 t5 t21 t33 t17 t19 t17 t3
long t63 t48 t59 t5 t72 t56 t50 t74 t19 t19 t15 t0 t19
mid t15 t7 t12 t64 t24 t6 t70 t71 t5
mid t12 t41 t72 t7 t24 t77 t35 t17 t34
long t28 t46 t38 t68 t0 t34 t42 t67 t54 t52 t6
short t56 t30 t0 t20 t11 t55
short t75 t48 t11 t9
short t9 t66 t26 t74 t6 t5
mid t15 t42 t34 t11 t60 t25 t76 t11 t9
long t49 t72 t51 t24 t28 t4 t35 t9 t39 t45 t61 t39 t58 t74
mid t39 t54 t19 t62 t43 t52 t61 t76 t2
short t72 t42 t76
short t37 t10 t70 t67 t23
long t32 t50 t39 t51 t5 t66 t67 t72 t3 t8 t6 t34 t51 t74
long t45 t73 t28 t38 t28 t28 t19 t44 t78 t61 t15 t52 t35
mid t43 t49 t16 t2 t74 t73 t26 t30 t26
short t79 t18 t62 t7
mid t64 t15 t75 t53 t15 t71 t49 t20 t56
short t73 t0 t25 t28 t64
long t39 t20 t51 t35 t6 t49 t7 t1 t44 t3 t37
short t39 t73 t70
long t61 t74 t45 t79 t9 t58 t64 t72 t45 t33 t6 t70
short t50 t37 t67
short t71 t49 t62
long t74 t43 t50 t27 t32 t76 t16 t35 t1 t72 t15
short t29 t12 t33 t47
short t22 t31 t30 t23 t59
short t27 t2 t9 t10 t50
long t50 t31 t47 t60 t54 t69 t1 t72 t41 t61 t6 t56 t55
long t28 t60 t60 t2 t4 t16 t29 t5 t0 t17 t71
mid t3 t13 t43 t64 t2 t4 t3
mid t44 t54 t51 t30 t59 t44 t16 t33 t37
long t63 t66 t20 t54 t64 t20 t27 t12 t49 t19 t48 t2 t24 t37 t59
short t37 t61 t51 t5 t47
long t5 t62 t47 t26 t64 t57 t74 t18 t39 t60 t73 t57 t11 t11
mid t29 t0 t17 t45 t62 t60 t56 t9
long t50 t8 t53 t16 t75 t45 t2 t71 t22 t58 t67 t59 t44 t0
short t50 t53 t52 t43 t45
long t7 t73 t39 t35 t21 t61 t11 t66 t31 t42 t20
short t43 t16 t58 t20 t39 t11
mid t1 t58 t11 t18 t60 t75 t73 t26 t73
long t5 t30 t4 t59 t79 t70 t15 t4 t36 t78 t7 t44
short t50 t0 t1 t69 t11 t52
short t30 t13 t53
short t38 t7 t69 t30
short t36 t3 t27 t77 t11 t1
short t31 t62 t20 t32 t14
short t28 t46 t40
long t3 t57 t48 t37 t40 t41 t33 t4 t76 t76 t17 t29 t58
short t75 t19 t40 t62 t67 t15
long t29 t27 t26 t68 t10 t40 t52 t64 t59 t53 t38 t37 t49 t58 t28
short t53 t5 t16 t40 t24
mid t45 t13 t49 t75 t51 t15 t14 t65 t71 t36
short t77 t20 t39 t37 t2 t20
long t12 t79 t55 t12 t35 t24 t48 t7 t79 t64 t50 t79 t19 t79 t24
short t52 t54 t70 t57 t37 t24
mid t17 t15 t4 t61 t26 t15 t11 t71 t12
long t6 t22 t54 t43 t64 t12 t15 t10 t65 t10 t8 t51 t70
mid t65 t68 t62 t24 t66 t13 t8 t30 t12 t54
long t47 t8 t70 t47 t3 t19 t17 t63 t48 t30 t3 t15 t32
long t30 t37 t25 t42 t54 t10 t72 t77 t76 t35 t26 t36
mid t58 t51 t78 t31 t63 t70 t63
long t47 t49 t62 t30 t48 t30 t16 t64 t11 t47 t33 t37 t42
short t52 t10 t42 t4 t31
mid t74 t55 t44 t76 t72 t41 t62 t62 t60 t23
mid t35 t44 t77 t64 t56 t9 t21 t33 t68 t31
long t16 t9 t55 t54 t44 t73 t3 t19 t65 t37 t24 t32 t25
short t9 t56 t48 t45
short t30 t24 t37 t28 t29 t79
mid t51 t47 t6 t47 t13 t11 t69 t66 t34 t33
long t9 t17 t6 t33 t47 t42 t49 t0 t48 t3 t8 t4 t14
long t58 t36 t69 t13 t23 t68 t69 t27 t32 t20 t57 t55 t9 t21
long t46 t57 t26 t68 t12 t78 t35 t0 t60 t74 t15
short t66 t17 t34
long t7 t59 t13 t28 t70 t38 t27 t6 t10 t35 t43 t21
short t18 t21 t29
mid t0 t21 t66 t76 t19 t19 t67 t45
mid t20 t14 t74 t12 t79 t69 t45 t79
mid t53 t9 t59 t28 t11 t40 t64 t75 t70
mid t31 t14 t38 t28 t33 t61 t57 t32
long t34 t57 t44 t45 t49 t63 t77 t29 t43 t78 t75 t39 t29
mid t42 t76 t9 t5 t62 t56 t17 t64
long t50 t6 t73 t24 t7 t65 t34 t35 t54 t66 t34
short t61 t44 t54
short t39 t69 t4 t67 t66 t28
long t32 t36 t57 t16 t9 t22 t36 t52 t3 t13 t54 t2 t19 t76
short t26 t57 t72 t74 t43 t20
short t76 t13 t22 t9
mid t37 t55 t57 t14 t68 t33 t0 t48 t39
long t68 t60 t49 t55 t41 t30 t47 t58 t25 t51 t13
short t2 t78 t44 t44
short t24 t35 t25 t18
long t55 t19 t55 t5 t67 t78 t33 t72 t18 t66 t46 t62 t5 t18 t1
long t19 t39 t25 t35 t56 t40 t51 t35 t48 t15 t62 t49 t13
short t54 t22 t62 t33 t37 t19
short t8 t50 t32 t7
mid t35 t62 t59 t68 t40 t74 t56 t39 t20 t73
long t58 t2 t22 t57 t61 t69 t30 t79 t1 t51 t8 t32 t45
long t13 t50 t17 t68 t54 t8 t13 t52 t12 t38 t13
long t50 t15 t74 t3 t6 t41 t7 t33 t68 t5 t4 t1
mid t35 t28 t78 t50 t68 t65 t21 t55 t30 t13
long t74 t50 t33 t2 t59 t20 t61 t67 t14 t32 t8 t59 t69 t14 t19
short t12 t21 t62 t19
long t29 t4 t36 t38 t21 t12 t77 t58 t9 t49 t69 t40 t24 t68
mid t45 t60 t13 t28 t9 t55 t39 t29
mid t56 t33 t68 t68 t10 t48 t61 t29
long t20 t31 t76 t21 t3 t62 t13 t9 t2 t12 t16
mid t46 t54 t44 t35 t63 t79 t75 t29 t68
long t56 t1 t61 t51 t32 t13 t46 t13 t70 t18 t53 t79
mid t59 t66 t70 t40 t47 t23 t62 t51 t72 t9
long t39 t56 t61 t13 t3 t57 t57 t9 t24 t79 t15 t32 t16
long t64 t30 t4 t14 t25 t18 t36 t78 t47 t21 t2 t42 t14 t13 t62
mid t30 t9 t5 t78 t12 t10 t35 t17
long t1 t50 t64 t25 t7 t27 t67 t33 t20 t21 t8
short t0 t67 t9 t14 t75
mid t11 t35 t79 t79 t25 t11 t31 t34 t32
long t59 t16 t1 t14 t34 t27 t68 t79 t60 t36 t66 t16 t23 t28 t73
mid t32 t71 t51 t55 t3 t70 t35
mid t4 t39 t60 t33 t7 t6 t58
long t12 t10 t65 t55 t36 t42 t27 t58 t37 t38 t54 t15
short t44 t68 t55
mid t45 t39 t22 t1 t43 t71 t28
short t54 t14 t52 t66 t55
long t32 t25 t73 t57 t20 t63 t69 t16 t50 t26 t58 t58 t14
mid t19 t21 t71 t20 t44 t17 t15 t63 t28 t39
mid t44 t9 t58 t1 t53 t27 t63 t45 t12
long t24 t19 t57 t2 t26 t11 t17 t36 t73 t77 t46 t64
long t16 t43 t6 t29 t9 t44 t56 t36 t42 t78 t21 t52 t11 t25 t51
short t43 t31 t49 t15 t44
long t67 t13 t32 t32 t45 t34 t43 t67 t5 t67 t57 t57 t10 t44
short t37 t70 t40 t40 t24
short t78 t50 t67 t25 t37
long t3 t64 t64 t68 t14 t17 t76 t19 t47 t57 t17
long t79 t79 t2 t74 t31 t26 t9 t59 t29 t1 t36
mid t54 t52 t46 t51 t30 t52 t73
mid t28 t51 t67 t77 t75 t47 t6 t41 t5
long t21 t64 t18 t0 t55 t51 t1 t61 t51 t17 t45 t39 t29 t11 t79
long t40 t19 t41 t68 t61 t5 t29 t8 t52 t35 t20 t7
short t74 t61 t1 t45 t36 t41
long t41 t76 t31 t55 t8 t76 t11 t10 t31 t32 t26 t63
short t27 t2 t40 t2
mid t6 t62 t20 t62 t62 t56 t49 t76
long t22 t10 t76 t48 t44 t31 t33 t59 t23 t17 t50 t22
short t57 t8 t33 t66 t10 t56
mid t57 t58 t8 t25 t68 t33 t11 t49 t4 t36
long t30 t74 t11 t9 t65 t15 t22 t79 t79 t0 t8
mid t11 t33 t41 t25 t45 t3 t77 t22 t6 t31
short t60 t31 t52 t25 t79 t0
mid t32 t74 t45 t24 t59 t75 t6
short t25 t79 t64
mid t1 t59 t45 t14 t79 t71 t53
long t70 t18 t54 t28 t41 t6 t43 t59 t4 t66 t46
long t17 t27 t25 t50 t17 t51 t11 t40 t57 t67 t43
long t69 t56 t7 t28 t9 t6 t31 t43 t52 t25 t66 t22
short t70 t44 t61 t4
short t74 t34 t17 t34
mid t79 t37 t64 t75 t74 t4 t35 t16 t14 t75
short t64 t2 t21 t40
long t52 t56 t48 t23 t30 t64 t52 t59 t14 t74 t63 t66 t4 t61
short t39 t68 t79 t58 t77 t3
long t3 t54 t28 t39 t15 t33 t18 t48 t24 t23 t34 t28 t18 t77
short t49 t4 t70 t20 t13 t0
long t21 t72 t75 t23 t64 t59 t64 t12 t15 t23 t31 t71 t18
short t44 t30 t0 t79
short t59 t58 t64 t47
short t42 t3 t44 t8
long t52 t53 t23 t2 t77 t2 t71 t27 t23 t21 t6 t7 t2 t66 t40
mid t55 t30 t64 t46 t7 t60 t79 t47 t50 t6
short t22 t17 t24 t43 t39
mid t35 t49 t17 t60 t7 t34 t21 t59 t27 t18
mid t35 t46 t34 t67 t59 t62 t5
mid t58 t12 t78 t23 t75 t55 t52 t46 t72 t12
mid t47 t33 t53 t54 t43 t7 t65
short t45 t3 t61 t26 t12 t34
short t29 t71 t25 t1
long t17 t18 t48 t67 t56 t63 t19 t76 t2 t76 t78 t9
short t5 t76 t29
short t55 t74 t19 t72
mid t76 t59 t70 t58 t19 t22 t79 t33
long t48 t7 t54 t54 t69 t48 t60 t57 t50 t52 t50 t27 t8
short t11 t75 t10
short t28 t66 t22
long t20 t77 t39 t66 t79 t53 t15 t17 t74 t33 t16 t14 t72
mid t37 t20 t45 t73 t67 t35 t0
long t55 t53 t75 t2 t73 t59 t5 t10 t64 t1 t55 t70 t13 t39 t6
short t79 t59 t26
long t73 t37 t57 t13 t10 t13 t38 t51 t76 t77 t44 t44
mid t66 t46 t22 t64 t40 t66 t63 t30 t64
mid t59 t8 t71 t43 t30 t65 t77 t9
short t32 t13 t70 t1 t14 t79
long t72 t55 t43 t32 t65 t3 t7 t33 t18 t54 t53 t76 t63 t56
short t48 t3 t66 t12 t39 t21
long t10 t44 t40 t41 t18 t17 t54 t35 t10 t56 t73 t51 t30 t35
long t78 t57 t67 t63 t22 t66 t13 t53 t38 t50 t27 t36 t54
mid t36 t27 t78 t30 t32 t32 t62 t12 t19
long t55 t32 t0 t7 t56 t72 t8 t47 t17 t18 t28 t68
mid t39 t30 t41 t63 t0 t57 t61 t67 t71
short t6 t46 t41
long t38 t1 t35 t24 t23 t79 t44 t42 t55 t44 t17 t77 t60
long t33 t31 t72 t69 t78 t60 t41 t38 t76 t25 t54 t15 t66
mid t70 t29 t63 t51 t77 t50 t75 t20 t1 t48
long t45 t58 t35 t58 t51 t12 t37 t50 t30 t45 t69 t66 t71 t67
short t2 t26 t65 t11 t54 t31
short t31 t23 t51 t52
long t73 t72 t22 t45 t77 t45 t30 t2 t3 t70 t29 t30
short t64 t42 t69 t73 t6 t71
short t63 t37 t39
long t3 t55 t33 t9 t74 t18 t6 t37 t51 t77 t45
long t76 t54 t2 t72 t64 t68 t17 t29 t1 t64 t27 t7 t31 t50 t16
short t26 t10 t79
mid t8 t76 t56 t48 t4 t73 t64 t35 t48 t58
short t79 t56 t14 t79 t54
short t11 t71 t64 t66 t51
long t50 t35 t59 t33 t63 t25 t65 t40 t30 t10 t70 t29 t45 t53
short t50 t20 t11 t11 t70
long t7 t20 t40 t2 t50 t24 t78 t40 t61 t4 t31 t43 t17 t75
short t52 t26 t54 t77 t54 t2
mid t59 t12 t62 t66 t25 t26 t5 t45 t44 t20
long t35 t47 t32 t5 t66 t1 t13 t8 t72 t57 t49 t62 t3
mid t50 t6 t45 t38 t55 t33 t1
mid t47 t25 t64 t74 t61 t60 t62 t10 t76 t76
mid t70 t65 t12 t29 t18 t29 t2 t79 t9 t12
short t77 t55 t30 t49
long t16 t30 t68 t21 t66 t47 t71 t19 t8 t71 t25 t22 t54 t23
short t75 t66 t35 t57 t36
long t65 t79 t24 t0 t22 t41 t32 t38 t15 t40 t68 t1 t26
long t58 t51 t17 t78 t9 t37 t38 t28 t59 t22 t46 t79 t34 t70 t66
mid t43 t40 t31 t28 t60 t16 t29
long t14 t0 t34 t75 t13 t67 t56 t30 t77 t32 t78 t58 t31 t32
short t12 t50 t65 t65
short t14 t70 t16 t66
mid t63 t24 t72 t13 t7 t68 t50 t4 t63 t52
short t29 t60 t21 t68 t3 t71
long t14 t72 t49 t53 t0 t8 t22 t75 t71 t9 t17
mid t20 t18 t3 t8 t29 t32 t57
mid t23 t22 t65 t16 t55 t9 t63 t3 t44
mid t47 t23 t32 t21 t33 t67 t77 t68
long t38 t77 t63 t57 t37 t70 t42 t8 t36 t78 t1 t59 t26
mid t58 t5 t74 t68 t65 t16 t15 t46
mid t5 t71 t1 t2 t43 t64 t0 t67
long t74 t21 t76 t54 t15 t75 t1 t21 t21 t73 t4 t74 t26 t37 t52
long t13 t21 t57 t50 t5 t4 t34 t50 t9 t48 t43 t58 t72
mid t13 t64 t77 t29 t35 t48 t78
long t57 t51 t19 t36 t1 t67 t16 t37 t33 t8 t47 t43 t57 t48
mid t70 t22 t25 t78 t26 t56 t64 t13 t29 t21
long t42 t0 t19 t71 t78 t78 t17 t38 t12 t51 t76 t69
long t21 t72 t8 t74 t46 t70 t5 t40 t12 t40 t24 t7 t48
mid t20 t45 t8 t25 t1 t50 t14 t51 t53
long t56 t27 t24 t54 t40 t46 t32 t36 t72 t21 t1
mid t79 t59 t12 t9 t50 t18 t7
short t22 t22 t59 t28
long t12 t49 t51 t56 t35 t20 t65 t64 t63 t23 t28 t54 t77
long t67 t78 t32 t1 t58 t24 t54 t33 t74 t27 t33 t45 t74 t42 t72
long t38 t17 t12 t13 t22 t5 t36 t70 t5 t42 t10
short t41 t11 t39 t64 t28
mid t38 t58 t55 t65 t17 t8 t19 t6
long t79 t54 t68 t71 t67 t10 t40 t21 t37 t49 t4 t19 t74 t28
long t21 t42 t5 t0 t51 t7 t64 t70 t69 t44 t65 t10 t77 t52
mid t47 t79 t46 t3 t33 t12 t18 t41
short t43 t38 t53 t37 t66 t20
long t27 t40 t27 t21 t30 t31 t16 t79 t65 t38 t56 t71 t50 t77
long t55 t30 t12 t3 t57 t38 t66 t27 t28 t75 t11 t35 t23
short t17 t60 t59
short t78 t62 t42 t77 t24 t77
long t4 t74 t72 t65 t73 t25 t56 t61 t66 t17 t57 t57 t78
short t25 t62 t47
mid t35 t53 t35 t50 t78 t30 t57 t22 t34 t17
short t41 t39 t72
mid t1 t59 t11 t50 t69 t34 t19
mid t0 t11 t61 t72 t39 t41 t22
short t60 t3 t21 t26
short t27 t44 t42
short t1 t78 t58 t22 t65 t77
long t59 t28 t50 t53 t46 t14 t22 t34 t1 t55 t62 t55 t69
long t33 t28 t19 t71 t77 t9 t54 t69 t29 t0 t4
short t58 t39 t44 t58 t5
mid t71 t44 t41 t35 t68 t2 t14 t42 t18
long t6 t4 t33 t3 t60 t30 t24 t74 t29 t1 t36 t49
mid t35 t41 t55 t62 t16 t35 t54 t28 t67 t55
mid t57 t60 t7 t22 t19 t25 t71 t45 t48 t77
short t14 t32 t23 t79
mid t9 t66 t79 t4 t46 t17 t0 t2 t30
long t20 t68 t75 t0 t8 t24 t17 t30 t42 t31 t13 t0
long t8 t42 t27 t26 t5 t68 t13 t25 t47 t48 t1
short t2 t3 t16 t11
long t18 t9 t53 t58 t53 t50 t78 t9 t74 t73 t33 t0 t41 t0
long t78 t19 t63 t2 t3 t51 t30 t0 t40 t65 t33 t24 t63 t30 t33
mid t76 t17 t58 t50 t31 t46 t71 t17 t29
mid t57 t66 t6 t63 t72 t58 t21
mid t43 t63 t42 t48 t60 t50 t6
long t5 t75 t72 t72 t59 t58 t73 t18 t13 t11 t53 t75 t50 t45 t29
long t49 t34 t41 t20 t23 t5 t5 t59 t64 t62 t68 t6 t19 t5
mid t32 t16 t50 t42 t7 t76 t76 t59
short t53 t75 t55 t43
mid t56 t16 t20 t78 t44 t15 t42
mid t20 t74 t19 t40 t40 t46 t50 t40 t1 t55
short t35 t11 t19 t42
short t24 t77 t0
long t41 t12 t23 t77 t42 t14 t55 t36 t21 t16 t40 t29 t6
mid t58 t68 t65 t5 t65 t0 t63
short t71 t44 t5 t18
short t43 t20 t9 t53
short t76 t71 t43 t11 t33
mid t39 t56 t1 t8 t64 t25 t30
long t41 t47 t19 t34 t58 t23 t38 t55 t52 t22 t44 t29
short t6 t70 t17 t23 t72
mid t65 t67 t66 t75 t23 t61 t14 t7
long t53 t17 t2 t49 t72 t51 t21 t73 t61 t6 t37 t25
short t40 t23 t61 t61 t26 t23
long t34 t70 t23 t36 t62 t12 t64 t18 t78 t14 t50 t57 t40
mid t63 t67 t71 t31 t42 t0 t34
mid t19 t12 t12 t65 t78 t39 t23 t28 t52 t59
mid t48 t42 t43 t46 t39 t72 t46 t57 t22 t26
long t60 t65 t25 t35 t47 t58 t19 t53 t21 t26 t73 t38
long t51 t72 t5 t65 t28 t2 t52 t54 t65 t47 t41 t52 t31 t15
mid t5 t46 t27 t43 t56 t60 t2
long t40 t3 t77 t57 t71 t75 t5 t59 t23 t75 t7 t59
short t13 t5 t4 t16 t35
long t54 t53 t6 t47 t16 t12 t60 t68 t66 t35 t12 t64 t32 t69 t77
short t66 t17 t58 t51
long t18 t75 t77 t37 t4 t4 t1 t56 t15 t58 t41 t79 t61
mid t77 t75 t6 t45 t34 t54 t44 t6 t21
short t68 t11 t8
long t52 t12 t17 t41 t24 t12 t21 t72 t59 t64 t56 t55 t54 t31 t5
mid t6 t56 t56 t46 t46 t12 t71 t50 t6
mid t30 t29 t3 t18 t79 t68 t59 t27
short t17 t54 t77 t51 t26 t25
long t67 t48 t26 t29 t57 t38 t70 t28 t4 t56 t10 t12
long t6 t70 t3 t21 t73 t65 t30 t51 t57 t38 t23 t37 t6 t39
long t72 t15 t8 t27 t11 t35 t70 t48 t70 t28 t34 t78 t70
long t16 t16 t4 t73 t51 t47 t74 t74 t58 t26 t57 t68
mid t35 t60 t36 t56 t15 t27 t44 t16 t72
mid t31 t0 t12 t45 t77 t19 t4 t77
short t3 t44 t34
mid t18 t27 t11 t17 t57 t34 t12
mid t0 t44 t4 t0 t8 t16 t20 t64
long t32 t39 t46 t7 t3 t17 t68 t71 t70 t4 t74 t68
short t64 t34 t61 t23 t51 t71
long t3 t39 t33 t69 t42 t64 t30 t67 t27 t31 t3 t8
short t33 t55 t21 t13 t67 t73
long t6 t16 t76 t17 t18 t5 t50 t0 t36 t49 t14 t18 t24 t45
long t19 t22 t62 t75 t8 t77 t44 t13 t38 t33 t65 t24
long t28 t75 t10 t48 t13 t72 t34 t10 t75 t49 t70 t31 t19 t1 t20
long t32 t63 t9 t78 t42 t24 t67 t24 t62 t27 t50 t1
long t27 t30 t8 t75 t75 t65 t75 t39 t55 t47 t19 t74 t5 t79 t16
mid t37 t46 t78 t39 t48 t60 t76 t54 t23 t54
mid t0 t78 t52 t23 t43 t23 t0 t34 t43
long t7 t77 t18 t44 t17 t48 t71 t34 t68 t8 t40 t14 t16 t38 t49
short t64 t40 t59 t40 t29
short t22 t41 t33 t45 t3 t12
long t29 t6 t73 t58 t17 t23 t60 t63 t22 t67 t50 t56
short t32 t9 t52 t55 t20
mid t44 t77 t66 t22 t45 t77 t46 t7
long t79 t26 t61 t36 t47 t16 t7 t70 t40 t40 t48 t44 t8 t9
mid t66 t28 t56 t75 t11 t69 t0 t7 t8 t52
mid t33 t28 t44 t3 t16 t27 t8 t71
mid t23 t64 t66 t64 t63 t68 t11 t55 t64
mid t54 t42 t47 t76 t42 t61 t79 t39 t79 t9
mid t35 t12 t5 t36 t59 t38 t69 t57 t9 t15
short t62 t61 t23 t65 t26
long t78 t54 t42 t29 t24 t4 t39 t74 t2 t56 t17 t33 t52 t69
long t38 t28 t66 t41 t71 t33 t26 t62 t16 t43 t62 t48 t27 t56 t57
mid t46 t63 t52 t7 t68 t47 t39
mid t26 t32 t10 t10 t62 t0 t39 t71 t26 t56
long t45 t13 t54 t55 t39 t40 t4 t56 t17 t0 t10 t60 t15 t32 t68
mid t53 t13 t3 t54 t43 t33 t75
short t34 t73 t56
short t28 t57 t9 t44
mid t51 t35 t31 t44 t75 t69 t9 t24 t17
long t22 t2 t38 t58 t75 t6 t71 t43 t38 t60 t29 t70
long t37 t69 t33 t71 t69 t75 t23 t2 t13 t2 t20 t19 t38 t57
long t71 t71 t30 t52 t74 t24 t76 t13 t7 t71 t24
long t23 t1 t53 t0 t58 t3 t19 t30 t69 t35 t27 t45 t6 t56 t61
short t65 t45 t57 t41 t9 t47
mid t76 t14 t41 t14 t10 t39 t63 t67 t8 t45
mid t68 t24 t35 t41 t8 t70 t17
short t38 t11 t6 t40 t75 t65
mid t0 t5 t36 t78 t66 t79 t79 t71 t72
long t21 t36 t29 t36 t62 t20 t15 t38 t51 t63 t43 t64 t60
short t59 t16 t57 t7 t44
mid t55 t50 t12 t50 t62 t7 t40 t56
short t68 t6 t3 t60 t52
mid t52 t16 t75 t75 t5 t11 t44
mid t11 t17 t65 t34 t23 t49 t44 t63 t71
short t74 t74 t26 t52 t56
short t39 t11 t12
mid t15 t78 t4 t8 t38 t39 t62 t61 t23
long t47 t43 t44 t58 t24 t38 t39 t8 t38 t41 t36
mid t47 t24 t72 t33 t12 t30 t34 t48
short t41 t58 t23 t33 t54 t42
long t4 t21 t62 t42 t74 t46 t65 t66 t64 t46 t29 t73 t46
long t65 t11 t3 t20 t19 t27 t7 t42 t58 t42 t27 t5 t45 t55 t40
long t44 t75 t14 t63 t75 t29 t32 t44 t39 t38 t70 t5 t58 t16 t71
mid t41 t3 t40 t68 t21 t44 t56 t79 t1 t79
long t4 t65 t2 t15 t63 t28 t21 t40 t3 t66 t52 t39 t29
long t55 t28 t25 t51 t23 t45 t77 t15 t21 t6 t47 t37 t14 t9
mid t41 t41 t6 t25 t57 t32 t53 t2 t61
mid t36 t16 t68 t5 t28 t46 t40 t72
long t38 t14 t19 t78 t47 t17 t72 t22 t48 t70 t11 t48 t66
long t77 t17 t53 t42 t40 t1 t46 t55 t58 t10 t53
long t73 t44 t62 t28 t48 t46 t20 t25 t58 t58 t1 t50 t44 t29
long t29 t60 t34 t63 t67 t32 t69 t72 t64 t78 t74 t7 t31 t70
long t65 t26 t72 t77 t22 t57 t9 t23 t46 t31 t71 t5
long t36 t53 t24 t8 t40 t11 t26 t63 t75 t40 t79 t55 t20 t5 t25
mid t77 t26 t77 t31 t20 t19 t46 t19
short t8 t56 t3 t38 t67
long t78 t35 t27 t25 t39 t48 t27 t72 t6 t27 t41 t19
short t52 t25 t5 t56 t6
mid t76 t45 t24 t37 t50 t75 t68 t37 t75
long t68 t28 t21 t5 t4 t59 t48 t23 t59 t70 t30 t21 t4 t70
mid t68 t75 t35 t66 t76 t75 t66
short t21 t27 t44 t0 t79 t75
long t34 t27 t12 t68 t14 t68 t42 t29 t17 t5 t16 t19 t19 t63 t62
long t49 t41 t18 t38 t77 t72 t51 t31 t41 t1 t61 t46
mid t51 t13 t28 t68 t53 t69 t62 t23
mid t45 t76 t33 t65 t75 t6 t27 t4 t44 t8
long t67 t8 t22 t60 t38 t79 t64 t70 t5 t39 t55 t29 t48
long t73 t42 t75 t74 t66 t13 t54 t24 t76 t37 t12 t77 t77 t78
long t63 t72 t72 t58 t0 t8 t24 t45 t2 t45 t27
short t15 t63 t31
short t0 t10 t74 t42 t18
mid t52 t22 t17 t24 t50 t18 t45 t63
long t76 t67 t13 t39 t55 t57 t70 t77 t65 t51 t66 t24 t34
short t63 t65 t37 t28
long t12 t48 t47 t0 t39 t8 t38 t71 t38 t72 t6
long t8 t48 t73 t49 t53 t73 t54 t66 t74 t51 t10 t28 t58
long t29 t75 t73 t69 t7 t46 t17 t56 t66 t11 t39
long t77 t79 t75 t31 t55 t76 t9 t74 t21 t47 t28 t59 t71
long t43 t10 t42 t16 t42 t23 t18 t25 t22 t46 t71 t1 t20 t61 t26
short t76 t5 t30 t52 t75
long t67 t36 t18 t11 t73 t73 t39 t65 t58 t44 t9
short t50 t16 t52 t34
short t27 t38 t17 t21 t78 t41
long t14 t69 t25 t22 t58 t54 t53 t48 t18 t30 t18
long t42 t52 t65 t69 t12 t76 t51 t28 t64 t70 t42 t64 t73 t15
short t76 t76 t39 t65
short t75 t11 t54 t10
long t35 t72 t57 t3 t46 t76 t67 t32 t11 t6 t41 t66 t68
short t51 t50 t10 t75 t12
long t15 t26 t4 t26 t73 t73 t78 t71 t20 t44 t75 t34 t44
short t29 t41 t64 t63
mid t56 t0 t1 t45 t57 t35 t51 t38 t62 t77
long t46 t26 t1 t15 t73 t68 t60 t47 t40 t66 t27 t54 t38
mid t28 t65 t23 t36 t50 t45 t26 t26 t20 t49
long t23 t66 t76 t8 t2 t16 t8 t60 t77 t42 t77 t13
short t5 t68 t54
long t65 t70 t18 t72 t2 t52 t15 t50 t20 t1 t51
short t14 t53 t16 t43
mid t64 t49 t50 t1 t40 t63 t65 t45
long t15 t10 t52 t66 t65 t65 t68 t15 t3 t33 t30
short t9 t38 t8 t26
mid t51 t26 t57 t67 t37 t0 t67 t27 t71 t56
short t56 t37 t59 t64 t50
long t43 t70 t50 t5 t61 t68 t77 t51 t67 t40 t30
short t23 t69 t37 t17 t69 t71
mid t17 t6 t63 t36 t10 t19 t34
mid t76 t57 t65 t40 t72 t22 t31 t22 t12
mid t78 t28 t9 t47 t17 t70 t17 t49
mid t60 t22 t60 t49 t77 t50 t39 t7 t7 t47
short t34 t14 t36 t15 t61 t37
long t13 t32 t73 t26 t32 t53 t16 t39 t21 t20 t41 t2 t11 t6 t54
mid t70 t59 t20 t62 t75 t68 t43 t53
mid t67 t26 t62 t41 t30 t74 t19 t27 t29
long t3 t22 t22 t37 t4 t35 t43 t69 t41 t14 t38 t23 t12 t75 t4
short t74 t4 t69 t14
short t69 t73 t12 t19 t45 t38
mid t21 t44 t75 t8 t17 t57 t56 t22
short t21 t64 t19 t52 t73
short t2 t49 t46
long t50 t73 t9 t52 t18 t33 t33 t52 t1 t64 t51
mid t32 t14 t61 t59 t20 t66 t67
long t37 t4 t7 t14 t64 t60 t56 t7 t58 t74 t50 t70 t8
mid t61 t8 t49 t33 t14 t21 t61 t25 t24 t37
long t70 t58 t11 t55 t8 t51 t64 t64 t19 t21 t10 t32 t62 t7
long t8 t52 t41 t69 t70 t6 t65 t24 t1 t66 t61 t59 t36 t47 t49
long t33 t30 t10 t12 t6 t9 t43 t35 t7 t72 t3 t35
mid t53 t72 t22 t29 t8 t21 t47 t65 t49 t76
mid t63 t23 t5 t46 t51 t38 t0 t11
long t51 t73 t40 t31 t67 t79 t33 t44 t73 t27 t49 t57 t48
long t5 t68 t3 t70 t61 t1 t58 t34 t33 t61 t76 t54
long t63 t21 t48 t55 t9 t71 t60 t56 t2 t69 t41 t8 t74
long t62 t49 t24 t71 t10 t17 t66 t74 t0 t4 t25 t39 t22 t25
long t37 t5 t54 t15 t23 t0 t17 t5 t2 t59 t19 t32 t75
long t24 t30 t25 t66 t32 t7 t61 t15 t11 t63 t74 t7 t8 t36
mid t59 t44 t53 t46 t62 t4 t31
long t62 t75 t42 t36 t20 t23 t41 t76 t70 t31 t47 t43 t71
long t37 t1 t56 t27 t51 t64 t77 t11 t75 t0 t1
short t30 t79 t11
long t25 t64 t25 t72 t40 t56 t74 t7 t29 t66 t61 t35 t7 t1 t6
short t56 t72 t48
short t27 t33 t31 t61 t74 t41
long t22 t61 t7 t44 t32 t42 t39 t73 t39 t28 t36 t14 t30
short t13 t28 t56 t15 t20
long t79 t70 t4 t24 t39 t18 t1 t62 t8 t36 t8 t7
long t31 t0 t72 t35 t3 t25 t28 t69 t0 t70 t75 t9
long t25 t22 t63 t63 t41 t12 t37 t68 t70 t36 t67 t41 t56
mid t3 t17 t63 t73 t51 t64 t18 t72 t76 t12
short t12 t64 t11 t5
mid t6 t52 t75 t56 t34 t40 t72
short t22 t78 t48 t54
short t49 t37 t24 t63
short t56 t62 t33 t62
short t34 t77 t25 t15 t43 t68
mid t29 t73 t5 t33 t59 t76 t52 t4
long t28 t15 t20 t30 t35 t50 t60 t8 t6 t75 t66 t60
short t75 t30 t43 t57 t56 t69
short t20 t72 t44 t35
mid t28 t9 t12 t61 t0 t58 t51 t74 t21 t57
mid t45 t39 t41 t62 t65 t19 t11 t0 t17 t29
long t78 t45 t43 t0 t74 t27 t22 t16 t22 t18 t35 t61 t7
long t42 t45 t26 t34 t72 t19 t68 t36 t53 t73 t63
short t4 t47 t23 t17
short t25 t59 t65 t68 t78
long t60 t58 t52 t31 t23 t31 t26 t57 t42 t53 t1 t46 t35 t57
mid t37 t66 t5 t71 t44 t19 t18 t64 t68 t6
short t18 t18 t27
long t27 t55 t67 t44 t1 t19 t24 t24 t8 t54 t63 t48 t32
short t10 t53 t10 t23 t48
short t62 t79 t61 t71 t28 t59
long t32 t12 t62 t12 t33 t8 t57 t41 t41 t77 t29 t72 t48 t10
long t46 t26 t77 t0 t19 t40 t56 t20 t10 t22 t72 t65 t7 t16
mid t50 t6 t12 t75 t16 t20 t18
long t32 t3 t22 t23 t12 t6 t4 t73 t41 t51 t33 t9 t0 t71 t18
long t35 t25 t2 t67 t30 t26 t62 t70 t33 t67 t40 t57
short t68 t0 t1 t66 t13
long t52 t3 t59 t22 t44 t53 t14 t56 t45 t32 t69 t75 t50
long t38 t63 t8 t10 t27 t63 t57 t66 t66 t19 t1 t31 t4
short t59 t24 t1 t48 t25
short t67 t75 t46 t67 t29 t1
long t17 t34 t0 t20 t21 t8 t65 t35 t59 t13 t77 t7 t17 t9
long t78 t68 t76 t50 t72 t75 t9 t3 t42 t39 t33 t53
short t11 t64 t78 t41 t19 t45
mid t0 t56 t58 t14 t30 t61 t58 t4 t52 t5
long t55 t7 t13 t49 t8 t61 t65 t35 t49 t18 t7 t4 t30 t12
mid t75 t22 t6 t48 t70 t7 t60 t68 t37 t44
long t26 t32 t29 t54 t38 t79 t39 t67 t13 t65 t10
short t58 t38 t34 t78 t24
mid t36 t65 t21 t21 t41 t2 t3 t76
mid t32 t17 t50 t21 t42 t65 t36 t0 t58
short t69 t34 t74 t38
long t3 t6 t56 t53 t52 t13 t1 t60 t68 t10 t45 t36 t79 t3
long t35 t35 t39 t31 t78 t49 t56 t77 t28 t12 t63 t14 t45 t59 t62
long t11 t50 t40 t75 t38 t33 t76 t38 t2 t5 t43 t33 t19 t0 t3
long t58 t54 t1 t40 t44 t28 t41 t74 t25 t47 t73 t17 t32
long t59 t1 t41 t62 t71 t53 t38 t17 t3 t50 t5
short t46 t41 t65
long t30 t47 t6 t22 t19 t74 t44 t13 t53 t41 t71
short t38 t64 t57 t36 t33
long t57 t36 t39 t61 t31 t31 t20 t16 t64 t78 t16 t4
mid t46 t37 t41 t2 t15 t76 t20 t57 t69
mid t12 t32 t17 t44 t42 t30 t26 t37 t68 t59
mid t6 t58 t2 t46 t35 t73 t40 t36 t47
mid t33 t42 t48 t33 t60 t11 t5 t3
mid t77 t72 t61 t53 t60 t59 t24 t11
short t37 t11 t67
long t12 t13 t20 t60 t40 t63 t22 t28 t27 t74 t30
mid t79 t65 t51 t35 t50 t65 t77 t34 t53 t2
long t47 t76 t31 t14 t37 t47 t0 t75 t29 t28 t55
short t76 t27 t27
mid t38 t79 t19 t57 t5 t47 t71
short t79 t8 t33 t54
short t70 t15 t60
short t48 t52 t4 t20
mid t4 t63 t18 t65 t26 t59 t18 t55 t62
long t72 t6 t53 t68 t44 t38 t13 t61 t24 t62 t51 t76 t23 t38 t33
long t14 t40 t51 t47 t13 t61 t2 t6 t79 t32 t57 t53 t0 t64
short t78 t19 t19
long t54 t33 t2 t62 t52 t31 t10 t69 t34 t76 t3 t1 t72
long t37 t37 t54 t53 t66 t51 t66 t39 t77 t2 t51 t78 t70
short t75 t59 t13 t68 t24
mid t17 t34 t60 t50 t35 t59 t25 t56 t68
short t20 t47 t28 t16 t38 t34
mid t70 t18 t21 t16 t29 t48 t51
short t22 t26 t26 t34 t30
mid t28 t36 t3 t61 t64 t13 t6 t42
long t55 t17 t62 t20 t39 t31 t46 t4 t30 t7 t14
long t70 t12 t70 t58 t35 t60 t44 t28 t32 t34 t30 t42 t77 t68 t62
mid t8 t4 t7 t22 t17 t77 t69 t29 t29
long t58 t50 t28 t70 t12 t73 t67 t34 t53 t57 t76 t56
short t74 t69 t5 t56
long t17 t25 t66 t27 t11 t65 t77 t9 t28 t49 t68 t23 t19
long t31 t54 t19 t64 t38 t73 t27 t14 t48 t13 t41 t36 t66 t78
mid t8 t53 t5 t25 t79 t46 t8 t14 t76 t75
mid t46 t18 t38 t14 t57 t57 t56 t3
mid t12 t62 t31 t76 t48 t67 t31 t25 t49
long t53 t28 t71 t69 t29 t25 t27 t65 t13 t2 t46 t35 t59 t71
mid t29 t15 t0 t2 t27 t57 t0
long t47 t54 t29 t1 t12 t39 t75 t50 t79 t50 t71 t66
mid t23 t15 t60 t76 t4 t76 t30 t77 t16 t40
short t42 t32 t36 t12 t30 t78
long t35 t45 t59 t33 t53 t66 t56 t78 t36 t57 t18 t0 t79 t56 t44
short t31 t43 t39 t71
short t54 t55 t76 t52 t36 t44
short t44 t11 t68 t68 t41
long t60 t60 t65 t65 t13 t41 t17 t16 t38 t53 t67 t10 t26 t8
short t22 t27 t61 t26 t42
mid t7 t4 t25 t12 t40 t9 t5 t45
mid t62 t66 t36 t13 t21 t22 t59 t43
mid t48 t53 t47 t18 t45 t47 t29 t0
long t43 t41 t57 t45 t74 t26 t63 t76 t67 t1 t54
mid t36 t10 t10 t69 t34 t77 t76 t2 t73
long t38 t71 t68 t68 t18 t19 t29 t64 t55 t6 t34 t51 t32
mid t72 t8 t23 t62 t25 t14 t78 t34 t24
mid t56 t57 t41 t56 t69 t34 t78 t14 t64 t77
mid t51 t54 t63 t24 t19 t26 t50
mid t22 t52 t50 t6 t15 t53 t11 t43
short t2 t43 t66 t20 t38 t7
short t31 t57 t74 t16 t20
long t16 t79 t67 t79 t57 t77 t37 t7 t23 t50 t0 t52 t29 t7 t30
mid t67 t79 t41 t36 t62 t26 t18 t37 t46
short t16 t52 t11 t21 t30 t13
short t16 t32 t49 t29 t54 t3
short t39 t35 t23 t59
mid t11 t51 t45 t44 t65 t42 t48 t47
long t66 t0 t36 t61 t72 t74 t41 t11 t15 t14 t29 t63 t54 t28 t59
long t71 t60 t15 t32 t26 t38 t33 t68 t49 t1 t79 t74
short t36 t7 t69 t52 t10
short t79 t38 t52
short t16 t17 t11 t24 t0 t21
short t5 t8 t66
mid t35 t12 t51 t17 t59 t16 t52 t13 t38
long t58 t41 t36 t63 t40 t43 t17 t63 t63 t74 t28 t16 t31
long t11 t15 t73 t36 t23 t57 t51 t42 t73 t29 t76 t72
mid t59 t19 t1 t11 t13 t78 t40 t25
long t36 t35 t40 t9 t23 t2 t44 t11 t36 t43 t68 t5 t41
mid t64 t79 t65 t68 t18 t44 t21 t6
short t28 t54 t37 t77 t49
mid t25 t11 t23 t24 t39 t74 t17 t36 t44 t27
mid t3 t27 t63 t28 t58 t63 t49
mid t66 t52 t2 t52 t25 t33 t26
short t28 t78 t30 t28 t70
short t73 t23 t39
mid t66 t77 t1 t72 t72 t56 t74 t44
mid t48 t36 t63 t36 t36 t47 t30 t13 t21 t78
mid t38 t38 t11 t52 t67 t12 t25
long t57 t78 t10 t28 t20 t7 t48 t61 t10 t11 t32 t35 t51 t6 t52
long t13 t41 t75 t22 t24 t75 t66 t37 t11 t8 t62
short t27 t57 t25 t68
short t75 t25 t68 t50 t54
long t52 t23 t42 t46 t64 t11 t38 t5 t3 t3 t28 t52 t75 t11
long t14 t21 t14 t52 t57 t69 t78 t47 t36 t11 t76 t50
mid t42 t54 t70 t54 t12 t2 t57
long t7 t58 t42 t68 t58 t1 t23 t24 t34 t24 t37 t79 t32 t54
long t59 t29 t41 t12 t72 t31 t60 t46 t78 t69 t13 t78 t74
mid t43 t52 t0 t34 t73 t60 t30 t57 t1 t46
mid t75 t39 t56 t61 t18 t40 t71 t14
long t49 t15 t69 t42 t12 t6 t21 t9 t43 t21 t49
short t41 t32 t13 t17
short t61 t21 t67 t51 t76
mid t76 t14 t55 t26 t63 t73 t22 t23
short t21 t2 t41 t11
long t49 t52 t34 t44 t22 t41 t6 t27 t31 t32 t66 t61
short t78 t3 t41 t4
long t17 t26 t43 t68 t20 t23 t9 t69 t59 t10 t23 t40
long t30 t24 t46 t11 t30 t59 t27 t71 t76 t63 t46 t77 t23 t58 t56
short t68 t41 t67 t58 t2
mid t72 t39 t75 t9 t27 t25 t8
long t56 t14 t54 t62 t2 t35 t31 t2 t78 t74 t21 t68
long t13 t42 t32 t28 t52 t67 t54 t9 t53 t79 t63
short t33 t72 t75 t4 t9
short t15 t12 t18 t30 t13 t18
mid t46 t29 t10 t68 t35 t73 t59 t43 t52 t20
short t54 t2 t78 t6
mid t61 t50 t12 t76 t78 t53 t18
mid t43 t25 t70 t53 t57 t73 t5 t11
long t64 t69 t30 t1 t25 t16 t5 t76 t24 t51 t66 t51 t36 t4
short t28 t1 t28 t17 t35
long t39 t49 t31 t28 t13 t72 t69 t17 t4 t40 t27
short t51 t57 t21 t73
mid t18 t69 t44 t77 t63 t14 t36
mid t23 t20 t42 t37 t32 t62 t40 t23 t50
mid t33 t67 t29 t68 t33 t73 t78 t20 t77
long t49 t44 t37 t55 t31 t35 t32 t69 t49 t39 t32 t54
mid t77 t62 t18 t29 t78 t34 t70 t53 t4 t20
mid t62 t70 t62 t49 t11 t35 t30 t41 t59 t11
short t77 t24 t73 t55
long t45 t39 t53 t38 t30 t70 t11 t7 t72 t22 t49 t64 t36 t51 t51
mid t56 t52 t47 t9 t58 t77 t41 t41
short t4 t74 t27 t1 t12
short t20 t36 t51 t78 t38
long t2 t30 t57 t46 t64 t57 t70 t30 t37 t11 t14 t39 t74 t30
mid t10 t52 t33 t54 t56 t70 t10 t43
long t43 t38 t28 t74 t68 t59 t1 t41 t72 t6 t29 t12
short t37 t18 t45 t5
mid t38 t39 t40 t34 t53 t36 t40 t24 t31
mid t20 t49 t2 t52 t23 t14 t7 t6 t63 t11
long t51 t39 t40 t63 t49 t66 t1 t9 t45 t73 t31 t8 t11 t24
mid t9 t70 t42 t73 t51 t14 t7 t69
short t70 t74 t56 t7 t64
long t3 t23 t45 t45 t0 t42 t32 t7 t21 t47 t10 t77 t61 t2 t59
mid t65 t33 t46 t49 t3 t34 t35 t78 t32
long t61 t70 t12 t35 t66 t25 t21 t71 t16 t38 t71 t74 t14 t4
short t71 t2 t17
mid t54 t10 t72 t3 t9 t61 t68
mid t41 t76 t46 t54 t6 t77 t75 t54 t57
long t47 t41 t55 t4 t34 t13 t5 t15 t66 t75 t70 t1 t77
mid t67 t60 t38 t45 t22 t34 t43 t39 t5
short t26 t31 t13 t50 t28
long t41 t57 t14 t44 t23 t3 t31 t27 t48 t25 t10 t19 t26 t65 t58
mid t49 t29 t6 t28 t68 t13 t69 t8
short t6 t45 t0
long t1 t54 t68 t75 t10 t75 t79 t28 t76 t23 t51 t35 t1 t58
mid t78 t44 t28 t3 t68 t53 t9 t9
short t3 t16 t45 t41
long t66 t78 t51 t27 t45 t31 t66 t75 t9 t2 t65 t1
long t12 t40 t68 t1 t46 t38 t29 t46 t70 t57 t66 t56
short t77 t5 t71 t22
long t36 t45 t5 t5 t32 t65 t14 t20 t40 t24 t43 t38 t36
short t25 t2 t46
short t15 t19 t19 t24
mid t59 t60 t60 t61 t13 t51 t58 t69 t75 t52
mid t38 t11 t69 t23 t76 t6 t8
short t50 t79 t27 t56 t15
long t10 t60 t36 t43 t65 t48 t41 t19 t7 t71 t8 t20 t27 t65
long t75 t68 t5 t67 t75 t66 t47 t49 t42 t71 t68 t75
long t41 t12 t45 t64 t44 t10 t48 t36 t10 t18 t36
long t33 t58 t63 t55 t64 t6 t51 t67 t52 t55 t34 t63
long t33 t4 t18 t74 t0 t10 t7 t35 t40 t73 t32 t8 t51 t21
short t66 t32 t0 t3
long t26 t29 t29 t24 t50 t1 t31 t24 t32 t51 t62 t14 t22 t24 t53
mid t0 t38 t76 t67 t47 t47 t12
mid t7 t39 t76 t43 t10 t13 t39 t45
long t34 t8 t12 t20 t18 t32 t52 t11 t11 t40 t53 t46 t30
short t6 t54 t49 t55 t19 t0
long t51 t67 t78 t61 t62 t67 t75 t77 t64 t33 t41 t5
long t30 t2 t63 t39 t27 t18 t7 t60 t37 t32 t17 t72
short t64 t3 t49 t47 t14 t19
short t60 t79 t78 t75 t68 t11
long t56 t34 t16 t51 t68 t45 t31 t57 t79 t24 t13 t79
short t72 t31 t41
mid t62 t17 t74 t9 t73 t56 t42 t14 t53
mid t67 t76 t35 t34 t56 t5 t24
short t1 t52 t24 t26 t50 t78
mid t26 t2 t49 t42 t31 t66 t47
long t66 t20 t0 t39 t49 t13 t22 t79 t23 t14 t37 t44 t72 t38
long t3 t40 t25 t5 t61 t79 t59 t64 t19 t51 t7
long t13 t43 t33 t48 t3 t15 t21 t61 t0 t10 t54 t30 t4 t61
long t7 t13 t76 t12 t22 t55 t29 t72 t70 t37 t9 t7 t53 t20
short t26 t30 t15 t37 t58
long t11 t76 t34 t48 t10 t76 t60 t39 t31 t59 t3 t34 t77 t21 t58
short t71 t35 t79 t40
short t15 t21 t77
short t42 t50 t44 t47 t73 t6
long t66 t10 t0 t71 t34 t75 t61 t14 t77 t65 t38
short t34 t63 t61 t48 t52
mid t76 t10 t47 t29 t71 t18 t32 t4
long t6 t1 t64 t12 t13 t56 t25 t47 t64 t32 t7 t60 t17 t71
long t11 t70 t66 t12 t17 t63 t9 t18 t43 t76 t37 t45 t66 t40 t17
mid t63 t2 t75 t53 t42 t43 t69 t52 t11
short t0 t16 t10 t55 t35 t73
mid t78 t39 t51 t45 t19 t18 t53
long t34 t8 t14 t14 t37 t42 t70 t40 t77 t69 t78
mid t60 t25 t13 t58 t60 t20 t6 t4 t71
long t14 t66 t30 t28 t47 t24 t3 t43 t39 t39 t76
short t37 t49 t8
short t58 t5 t29
short t25 t15 t79
mid t72 t75 t77 t73 t23 t17 t74 t39
short t52 t49 t10 t25
mid t45 t40 t20 t13 t38 t62 t42 t6 t36
short t10 t52 t14
short t69 t24 t17 t25
long t1 t38 t53 t33 t45 t60 t22 t56 t27 t22 t50 t22 t9 t61
long t0 t51 t54 t18 t28 t69 t11 t78 t41 t1 t74 t2
long t36 t78 t61 t13 t13 t62 t39 t61 t22 t21 t67 t74 t58 t8 t59
long t16 t38 t38 t11 t22 t61 t20 t3 t16 t30 t54
short t73 t6 t78 t26 t11 t52
long t31 t75 t12 t19 t74 t58 t34 t26 t27 t11 t61 t69 t11 t10
long t48 t2 t66 t60 t5 t3 t62 t5 t78 t15 t77 t19 t28
long t75 t26 t34 t25 t12 t3 t15 t67 t10 t30 t52
short t10 t45 t4
short t50 t50 t1 t6 t18
long t41 t57 t16 t7 t27 t26 t47 t68 t57 t26 t10 t61 t61
long t24 t46 t10 t77 t73 t76 t46 t72 t70 t55 t6
long t28 t42 t51 t18 t4 t36 t64 t25 t76 t26 t30
long t39 t17 t70 t51 t68 t73 t21 t9 t55 t35 t28 t4
short t75 t42 t27
long t44 t65 t50 t3 t63 t36 t59 t6 t1 t13 t64 t3
mid t30 t13 t53 t23 t36 t64 t7 t66
short t76 t13 t23
short t41 t8 t20 t72 t21 t18
short t25 t24 t0 t27 t60 t38
short t48 t9 t72 t1 t77 t36
short t26 t54 t59 t70
long t17 t28 t49 t53 t43 t18 t58 t18 t19 t61 t5 t24 t58
short t18 t25 t2
short t38 t21 t70
long t24 t16 t68 t77 t78 t26 t55 t16 t71 t47 t3 t30 t62 t71
long t37 t25 t9 t77 t43 t54 t17 t35 t4 t53 t76 t55
long t26 t40 t11 t73 t49 t30 t1 t57 t77 t15 t54 t62
long t46 t26 t45 t74 t32 t53 t10 t2 t57 t3 t52 t49
long t32 t41 t29 t0 t39 t58 t12 t39 t52 t49 t13 t73
short t11 t52 t0 t21 t29
short t6 t70 t51 t60
mid t49 t36 t32 t36 t53 t19 t41
short t6 t47 t57 t30
long t12 t6 t59 t31 t59 t17 t42 t63 t26 t73 t41 t63 t74
short t77 t72 t56 t38 t24 t32
mid t46 t47 t12 t62 t74 t6 t3 t10
short t47 t76 t61 t41
mid t73 t68 t48 t62 t50 t73 t68
long t20 t6 t62 t22 t17 t24 t21 t43 t68 t9 t77 t78
short t1 t56 t53 t12 t77 t51
mid t64 t13 t42 t61 t40 t10 t5 t69 t56 t41
long t56 t37 t20 t23 t75 t9 t38 t5 t44 t51 t76 t72
long t2 t43 t49 t36 t54 t21 t65 t68 t35 t59 t8 t53
mid t64 t69 t49 t12 t18 t73 t54 t32 t16
mid t39 t73 t55 t7 t37 t9 t47
short t71 t19 t61
mid t49 t76 t22 t11 t50 t42 t37
long t26 t11 t52 t47 t2 t31 t70 t54 t79 t19 t71 t59
mid t65 t62 t47 t56 t70 t34 t50 t10 t37 t6
short t54 t40 t22 t36 t39 t13
short t33 t11 t3 t54 t2
long t31 t34 t35 t11 t39 t74 t63 t77 t66 t34 t49 t31 t42
short t24 t23 t59 t13 t71 t28
short t54 t69 t72
mid t42 t29 t47 t11 t64 t72 t52 t66 t27
long t26 t47 t32 t54 t19 t79 t72 t46 t65 t47 t30 t70 t76 t9 t31
mid t74 t42 t56 t33 t42 t10 t1
mid t71 t37 t74 t42 t72 t43 t15 t7
mid t34 t29 t59 t16 t52 t32 t66 t73 t63
long t58 t1 t33 t29 t3 t25 t2 t13 t25 t75 t53 t21 t63 t62 t60
short t43 t57 t54
short t29 t21 t79
long t70 t66 t79 t78 t1 t75 t10 t65 t62 t62 t37 t28 t16 t69 t72
long t78 t47 t23 t66 t13 t35 t66 t9 t11 t73 t52 t51 t55
short t51 t55 t40 t58 t69
short t76 t54 t54 t40 t6 t58
mid t60 t36 t28 t64 t68 t37 t58 t40 t73 t0
long t43 t59 t37 t58 t36 t53 t55 t54 t54 t65 t59
short t78 t66 t18
long t75 t77 t59 t67 t0 t29 t60 t11 t3 t58 t61
long t6 t28 t21 t24 t72 t66 t14 t53 t32 t1 t19 t52
long t46 t76 t31 t72 t50 t41 t64 t8 t9 t71 t35 t72 t64
short t12 t67 t23
long t24 t65 t10 t43 t25 t49 t21 t52 t26 t54 t24 t18 t57 t33 t14
mid t29 t29 t43 t4 t72 t39 t34 t60 t61 t60
long t39 t66 t7 t56 t55 t57 t47 t49 t48 t66 t61 t28
short t21 t28 t28 t70
long t29 t52 t2 t8 t58 t49 t33 t66 t40 t25 t18 t13 t51 t47 t22
short t23 t76 t58
mid t22 t79 t8 t37 t72 t40 t36 t72
mid t52 t67 t59 t31 t67 t70 t45 t43 t52
mid t73 t55 t38 t10 t22 t38 t76 t4 t56
long t47 t63 t48 t45 t24 t46 t77 t1 t30 t26 t32 t30 t62 t25 t45
short t61 t42 t50 t17 t48 t67
long t16 t10 t4 t9 t29 t18 t65 t32 t23 t34 t59 t41 t0 t75
short t40 t69 t16
long t49 t13 t51 t67 t46 t29 t68 t42 t14 t41 t2 t7 t75 t28 t61
mid t5 t52 t40 t47 t11 t74 t26 t52 t32
long t11 t47 t75 t12 t16 t37 t67 t49 t25 t75 t44 t0 t7 t25 t22
long t45 t24 t31 t27 t59 t17 t17 t11 t13 t17 t77 t72
mid t69 t37 t9 t65 t17 t5 t74 t6
short t17 t55 t42 t38 t17
long t53 t9 t24 t31 t69 t16 t6 t69 t28 t59 t62
mid t12 t14 t41 t69 t78 t59 t38
short t7 t16 t13 t35 t52 t49
short t42 t28 t34
long t36 t28 t33 t50 t39 t43 t27 t60 t22 t70 t62 t11
mid t50 t14 t78 t9 t48 t70 t28 t58 t58 t77
mid t79 t20 t67 t43 t40 t63 t27 t24 t48
short t26 t20 t8 t8
long t21 t33 t1 t37 t14 t31 t24 t5 t3 t29 t46 t40
long t78 t72 t37 t75 t63 t30 t44 t37 t20 t75 t23 t47 t20 t74
mid t6 t32 t50 t34 t42 t12 t54
long t2 t6 t78 t71 t62 t75 t49 t65 t77 t71 t19
mid t58 t34 t43 t71 t72 t73 t66 t73 t72
mid t45 t78 t32 t14 t76 t51 t54 t28 t67 t36
long t69 t39 t50 t73 t71 t20 t67 t7 t37 t29 t54 t52 t17
long t60 t49 t67 t27 t19 t9 t14 t28 t67 t36 t2 t62
short t43 t26 t75 t68
short t14 t9 t41
mid t8 t56 t5 t41 t19 t3 t55 t56 t59
short t48 t0 t45
mid t4 t35 t58 t4 t4 t49 t62 t16 t6 t75
mid t30 t49 t29 t21 t68 t3 t18
long t24 t19 t66 t76 t53 t33 t30 t78 t18 t56 t27 t60 t9 t18 t33
long t14 t79 t0 t53 t55 t47 t35 t49 t2 t1 t62
short t19 t18 t44 t33 t27 t47
long t5 t50 t49 t39 t78 t2 t19 t17 t79 t54 t0 t60 t70 t62
short t20 t43 t26 t15 t13 t77
long t61 t23 t36 t77 t4 t21 t23 t29 t28 t24 t52 t15 t46 t45
long t14 t23 t79 t46 t74 t17 t46 t3 t55 t57 t42 t77 t21 t58 t49
short t78 t28 t66 t64 t2
short t1 t51 t32 t43 t22 t73
long t15 t67 t77 t43 t70 t46 t62 t8 t26 t31 t20 t29 t3 t69
long t72 t20 t9 t0 t11 t24 t50 t32 t63 t68 t0 t64 t56
short t47 t12 t14 t77 t9 t19
short t9 t55 t31
mid t76 t54 t57 t35 t59 t6 t53 t13
mid t76 t37 t75 t56 t35 t73 t26 t71 t0 t52
mid t67 t9 t36 t16 t1 t46 t32 t1 t50 t76
long t74 t69 t50 t15 t56 t43 t74 t39 t34 t15 t5 t19 t63 t8
short t21 t19 t42 t61
long t78 t33 t70 t51 t52 t35 t31 t56 t43 t75 t58 t14 t41
long t57 t63 t44 t48 t14 t0 t36 t66 t39 t12 t37 t4
long t2 t60 t35 t61 t56 t38 t36 t32 t39 t59 t52 t57
long t27 t36 t60 t20 t32 t12 t76 t40 t47 t71 t19 t27 t57
short t59 t22 t51 t12 t17 t41
short t70 t67 t67
long t30 t24 t23 t40 t51 t36 t77 t45 t35 t55 t29 t2
short t0 t64 t62 t69
long t58 t26 t74 t10 t23 t69 t49 t32 t76 t16 t39 t51
long t71 t20 t0 t51 t54 t32 t36 t70 t73 t22 t4
short t19 t68 t59
mid t34 t72 t17 t64 t57 t9 t66 t44
mid t10 t11 t50 t4 t74 t44 t2 t34
short t51 t18 t41 t32 t69 t29
short t33 t37 t18 t67 t66 t55
mid t30 t69 t48 t34 t64 t40 t20 t15 t55
mid t70 t14 t71 t27 t32 t68 t49 t79 t27
long t54 t70 t59 t11 t41 t72 t1 t10 t23 t49 t43 t42
short t11 t29 t77 t57
mid t14 t42 t72 t68 t7 t43 t52
short t5 t28 t48 t20
short t39 t76 t23 t16 t47 t69
short t75 t46 t77 t63 t12
long t10 t18 t0 t2 t59 t29 t76 t1 t58 t0 t35 t11 t42 t66
mid t1 t46 t66 t48 t3 t65 t38 t42
long t21 t7 t71 t52 t45 t19 t28 t51 t37 t64 t38 t64
long t69 t7 t11 t61 t8 t48 t28 t75 t15 t60 t65 t77
mid t2 t46 t26 t40 t33 t25 t42
long t12 t18 t47 t20 t18 t42 t58 t49 t16 t42 t28 t39 t78 t25 t2
mid t51 t6 t68 t10 t21 t5 t3 t8
short t70 t8 t53 t76
long t44 t75 t48 t9 t70 t63 t3 t53 t64 t53 t5 t52 t14
short t58 t21 t34 t53
mid t40 t48 t41 t10 t56 t55 t63
long t66 t39 t19 t76 t40 t73 t42 t24 t57 t26 t46
short t36 t54 t39 t77 t2 t31
long t1 t21 t77 t3 t37 t43 t67 t44 t74 t39 t36 t72 t40 t62
mid t25 t72 t18 t41 t36 t46 t2 t45
short t35 t76 t29 t43 t0
mid t43 t36 t63 t7 t73 t59 t75 t18 t24
long t30 t51 t61 t37 t26 t4 t71 t8 t79 t60 t42 t11 t37 t33
long t72 t72 t23 t65 t4 t34 t26 t65 t17 t67 t75
long t42 t19 t0 t52 t1 t18 t61 t5 t22 t14 t74 t26
long t7 t74 t67 t15 t69 t51 t36 t32 t28 t22 t16 t37 t4 t17 t26
mid t49 t65 t29 t6 t22 t45 t60 t56
mid t71 t37 t31 t8 t66 t33 t40
short t8 t14 t45
long t4 t70 t0 t66 t3 t26 t21 t30 t17 t36 t44 t55
short t29 t2 t16
mid t11 t7 t55 t57 t47 t48 t9 t38
long t79 t74 t50 t71 t16 t3 t17 t9 t21 t71 t62
short t67 t41 t20 t70 t49
short t24 t3 t16 t9 t46
long t16 t22 t16 t70 t52 t43 t5 t23 t50 t70 t60 t2
mid t39 t24 t10 t0 t5 t71 t16
long t38 t40 t38 t70 t27 t21 t37 t25 t28 t14 t44 t79 t13 t25 t56
short t68 t34 t46 t61
mid t33 t5 t38 t44 t76 t5 t11 t70
mid t15 t51 t33 t12 t16 t23 t44 t49 t21 t34
mid t10 t9 t28 t30 t72 t31 t28 t14
short t53 t26 t47 t44 t76 t29
short t6 t51 t3 t31 t45
long t30 t23 t56 t70 t34 t42 t49 t76 t74 t61 t48
long t25 t12 t51 t68 t17 t47 t67 t43 t0 t56 t41 t2
mid t69 t12 t62 t53 t21 t47 t73 t10 t14 t75
long t50 t69 t8 t12 t78 t5 t51 t28 t76 t9 t38 t17 t28 t15 t38
short t77 t62 t75
mid t10 t45 t67 t72 t54 t52 t70 t22 t2
long t22 t39 t12 t49 t60 t75 t33 t59 t26 t62 t46
mid t37 t23 t18 t36 t28 t42 t51 t70
long t65 t40 t79 t78 t26 t71 t16 t72 t58 t76 t37 t74 t50 t9
mid t72 t33 t33 t26 t14 t6 t56
long t53 t51 t28 t59 t79 t14 t77 t20 t75 t31 t58
long t11 t41 t59 t79 t59 t72 t18 t66 t34 t18 t21 t4 t42 t0 t12
mid t22 t29 t38 t39 t21 t50 t20 t34 t4
long t74 t14 t3 t59 t52 t10 t64 t3 t77 t4 t72
mid t10 t47 t23 t37 t22 t13 t20
mid t77 t69 t66 t47 t29 t72 t10 t39 t27 t73
long t52 t40 t37 t23 t71 t0 t31 t24 t57 t41 t63 t18 t11
long t47 t75 t62 t11 t66 t25 t62 t26 t25 t59 t13 t7 t67 t78
mid t59 t53 t20 t44 t40 t72 t35 t45 t31
mid t59 t5 t51 t63 t20 t28 t41 t76 t64 t62
short t2 t16 t46
mid t15 t55 t41 t12 t54 t27 t68 t43
long t56 t7 t69 t42 t64 t65 t65 t44 t14 t23 t25 t65 t13 t4 t13
long t1 t41 t45 t52 t46 t26 t64 t13 t73 t53 t72 t46
mid t43 t28 t72 t18 t38 t55 t9
mid t0 t27 t14 t3 t29 t13 t42 t17 t1
long t39 t62 t22 t62 t8 t63 t38 t25 t5 t18 t21 t37 t62
long t36 t41 t53 t50 t18 t69 t40 t47 t19 t1 t17 t49 t66 t58 t26
short t30 t32 t19
mid t27 t24 t34 t31 t40 t59 t75 t42 t20 t8
long t79 t3 t33 t52 t9 t0 t60 t41 t57 t38 t46 t40 t47
mid t75 t78 t57 t12 t71 t15 t23 t53
mid t31 t44 t10 t27 t1 t50 t78
short t35 t40 t23
short t42 t79 t73 t73 t2 t38
long t62 t18 t55 t76 t14 t17 t25 t52 t30 t72 t18
mid t68 t2 t76 t12 t31 t79 t79 t62 t9
short t47 t60 t48 t8 t41
long t38 t46 t0 t48 t31 t43 t61 t43 t56 t69 t4 t39
short t0 t63 t54
long t67 t17 t54 t21 t52 t26 t51 t70 t15 t74 t27 t47
long t18 t58 t10 t70 t61 t31 t53 t75 t34 t22 t58 t58 t59 t65
long t69 t57 t43 t45 t62 t34 t55 t54 t73 t26 t15 t72 t6
long t12 t38 t75 t31 t26 t17 t34 t13 t69 t54 t72 t79 t9
short t71 t72 t35
long t70 t42 t39 t6 t77 t1 t59 t40 t45 t12 t21 t15
long t14 t15 t52 t29 t31 t15 t14 t7 t3 t18 t54 t78 t24 t29
short t21 t60 t65 t26 t79 t3
short t79 t71 t49 t48 t41 t37
mid t17 t14 t64 t42 t9 t79 t43 t26 t33
mid t14 t49 t48 t64 t48 t1 t22
long t13 t73 t4 t5 t63 t62 t23 t65 t59 t68 t61 t22
long t24 t77 t41 t31 t6 t70 t69 t27 t45 t57 t40 t58
short t46 t6 t70
mid t75 t9 t5 t45 t44 t67 t3 t57
mid t12 t26 t77 t8 t39 t59 t29 t13 t72
short t8 t51 t6 t18
mid t6 t24 t74 t34 t64 t14 t4 t28 t75
short t7 t10 t51 t6 t4 t19
mid t64 t7 t40 t28 t49 t25 t69
long t24 t58 t28 t37 t17 t66 t19 t18 t73 t37 t64
mid t47 t21 t79 t1 t64 t33 t72 t2 t39
long t12 t56 t18 t61 t68 t53 t39 t60 t13 t34 t38 t48 t32 t34
short t50 t65 t7 t57
long t51 t11 t37 t56 t39 t6 t51 t6 t47 t15 t34
mid t48 t31 t50 t35 t39 t12 t2 t68
mid t55 t3 t10 t72 t71 t43 t5 t8 t32 t37
short t32 t49 t24 t51 t14 t37
long t2 t63 t32 t28 t18 t7 t34 t69 t8 t57 t68
short t58 t63 t65 t46
long t34 t39 t52 t5 t3 t59 t48 t15 t10 t43 t32 t24 t36 t22
mid t44 t58 t66 t45 t70 t59 t4
long t7 t79 t48 t10 t58 t11 t78 t53 t53 t17 t38 t68 t40 t41 t53
mid t66 t20 t40 t58 t51 t65 t62 t1 t62 t46
long t76 t17 t1 t76 t21 t25 t1 t23 t49 t48 t44 t21 t20 t49 t1
long t4 t28 t8 t5 t57 t45 t52 t68 t27 t58 t40 t66 t74 t37 t50
mid t53 t26 t3 t75 t9 t14 t2
mid t49 t41 t51 t29 t35 t42 t13 t74
mid t66 t16 t70 t49 t7 t75 t34 t67
short t34 t63 t3 t34 t59
short t4 t70 t11 t59 t28
mid t27 t62 t66 t59 t68 t53 t41 t25
long t33 t66 t30 t19 t65 t1 t15 t8 t6 t20 t10 t2 t18
short t18 t70 t69
long t75 t36 t48 t76 t35 t34 t12 t58 t57 t34 t63 t31 t40 t42
long t11 t66 t19 t79 t36 t32 t46 t48 t25 t51 t6 t42 t56 t5 t8
mid t59 t36 t14 t78 t64 t8 t23
short t75 t20 t62 t56
short t59 t28 t57 t5 t12
short t27 t13 t50 t60 t18 t58
long t49 t46 t37 t29 t65 t19 t2 t54 t30 t21 t53 t36 t70 t42
long t40 t32 t52 t28 t6 t69 t43 t44 t33 t31 t27 t3 t11 t58 t77
long t5 t39 t16 t66 t44 t30 t32 t28 t24 t77 t3 t53
mid t45 t4 t44 t78 t79 t54 t68 t73 t16 t23
mid t63 t17 t63 t33 t28 t65 t26
short t79 t78 t10 t69 t28
short t38 t4 t65 t37 t35 t29
long t76 t67 t54 t37 t36 t11 t41 t44 t35 t65 t78 t66
short t5 t3 t61
short t43 t16 t38 t53
short t13 t75 t65 t15
mid t59 t15 t40 t59 t12 t48 t75
long t8 t44 t1 t13 t19 t16 t47 t69 t76 t24 t58 t49
mid t59 t26 t22 t44 t66 t32 t4 t4 t26
long t73 t71 t76 t52 t71 t33 t53 t31 t23 t62 t42 t58 t7 t47
short t76 t32 t16 t64
short t40 t1 t63 t61
short t63 t72 t52
short t71 t25 t19
short t61 t64 t45 t74 t1
mid t59 t7 t13 t59 t6 t32 t9 t39 t49
long t40 t8 t51 t5 t77 t9 t67 t7 t60 t38 t42 t43 t54
long t72 t3 t45 t76 t0 t22 t51 t12 t28 t17 t18 t32 t31
mid t64 t58 t67 t61 t56 t4 t64 t14 t74
long t73 t29 t10 t12 t22 t31 t79 t34 t23 t9 t61 t38
short t72 t77 t44 t26 t49
mid t18 t30 t25 t0 t52 t9 t63
short t79 t63 t70
short t2 t24 t7 t51 t4 t53
short t28 t29 t9
mid t79 t76 t64 t57 t35 t36 t48 t17
mid t5 t15 t16 t34 t72 t47 t66 t29 t77
long t59 t76 t14 t12 t41 t5 t17 t5 t65 t14 t48 t19 t29
short t61 t6 t47 t58
short t2 t38 t68 t26 t39
mid t56 t51 t60 t65 t42 t56 t55
long t54 t46 t27 t65 t49 t64 t55 t33 t22 t75 t76 t3 t29
short t70 t17 t75 t32
long t45 t14 t58 t26 t62 t69 t79 t75 t74 t72 t25
long t77 t58 t24 t28 t56 t53 t43 t51 t77 t5 t45 t43
mid t71 t68 t75 t35 t73 t79 t39 t69 t77 t20
long t47 t43 t23 t73 t73 t76 t10 t67 t56 t45 t23 t73 t78
long t46 t37 t17 t78 t21 t36 t68 t31 t34 t1 t23 t61 t76
short t67 t69 t69 t68 t68
long t64 t68 t11 t0 t61 t20 t71 t72 t35 t57 t47
short t49 t1 t20 t27
mid t20 t1 t78 t71 t68 t45 t7
short t57 t65 t8
mid t26 t36 t42 t57 t0 t0 t78 t25 t21 t10
long t39 t43 t39 t35 t49 t29 t35 t5 t5 t18 t47 t17 t23 t54
short t57 t13 t28
long t37 t72 t11 t47 t10 t54 t10 t10 t2 t13 t5
long t47 t8 t60 t58 t44 t21 t79 t21 t26 t26 t48
mid t46 t57 t33 t41 t20 t48 t24 t57 t35 t75
long t74 t54 t62 t21 t43 t75 t40 t71 t11 t27 t73
mid t47 t11 t14 t61 t75 t15 t39 t69
long t14 t37 t54 t66 t68 t32 t57 t10 t24 t61 t55 t21
short t70 t22 t51 t73
mid t12 t22 t33 t16 t34 t9 t47
mid t79 t72 t22 t10 t71 t74 t59
long t37 t45 t45 t9 t19 t6 t21 t74 t70 t18 t59 t47 t66 t73 t26
long t1 t59 t57 t49 t73 t36 t34 t48 t67 t21 t11 t41 t75
long t7 t75 t72 t45 t74 t54 t35 t43 t49 t36 t40 t17 t38 t70 t14
mid t68 t60 t49 t63 t23 t24 t2 t66
short t20 t0 t61 t18
short t62 t52 t43 t9 t18 t76
mid t60 t29 t26 t70 t48 t2 t64 t6 t29 t8
mid t53 t55 t47 t68 t77 t72 t73
mid t63 t60 t43 t18 t15 t40 t19 t49
mid t19 t44 t7 t37 t17 t68 t59 t58 t44 t13
long t21 t55 t9 t44 t25 t7 t53 t41 t77 t57 t8 t21
mid t46 t9 t54 t36 t1 t10 t28
long t0 t54 t26 t58 t72 t48 t41 t52 t1 t76 t75 t37
long t37 t46 t51 t58 t57 t1 t3 t30 t66 t15 t30 t79 t3 t2
long t47 t29 t20 t19 t70 t74 t68 t71 t23 t63 t28 t11
long t27 t57 t64 t26 t31 t72 t63 t27 t43 t32 t23 t44 t39 t59
mid t30 t7 t58 t47 t32 t42 t65 t40
long t27 t18 t14 t64 t32 t60 t71 t52 t16 t53 t32
mid t4 t15 t76 t6 t22 t54 t30 t65
short t46 t12 t20 t57
long t72 t27 t49 t70 t30 t2 t21 t37 t14 t36 t4 t52 t17 t65
long t57 t42 t75 t75 t32 t33 t2 t5 t78 t75 t62
long t9 t34 t63 t67 t6 t67 t60 t11 t76 t73 t77
short t63 t30 t36
long t56 t68 t23 t43 t64 t43 t75 t61 t55 t6 t53 t47 t41 t24
long t30 t45 t68 t69 t45 t15 t11 t63 t42 t55 t61 t9 t75
long t13 t51 t42 t53 t3 t67 t34 t7 t78 t1 t31 t40
long t5 t42 t2 t78 t27 t18 t75 t15 t74 t72 t24 t1 t47 t24
long t7 t77 t66 t26 t45 t14 t30 t66 t43 t23 t58 t29 t24
short t15 t71 t11 t66
long t29 t20 t55 t57 t46 t65 t14 t56 t63 t66 t12 t12 t26
long t26 t44 t71 t6 t48 t8 t42 t30 t14 t39 t6 t69 t35
long t53 t14 t26 t63 t50 t50 t71 t3 t15 t51 t3 t36
short t11 t43 t60 t56 t79
long t35 t27 t49 t68 t37 t78 t36 t31 t66 t11 t46 t42 t29 t19
mid t25 t37 t35 t4 t24 t54 t1
long t30 t76 t3 t4 t15 t33 t69 t62 t14 t35 t65 t21 t18 t60
long t48 t70 t15 t47 t37 t34 t13 t39 t56 t23 t70 t78 t1 t48
short t69 t78 t5 t38 t5
mid t51 t44 t63 t79 t34 t2 t75 t0 t61 t38
mid t74 t7 t3 t20 t26 t50 t43 t51 t78
short t37 t40 t22 t53 t59 t70
short t26 t39 t42 t55 t71
mid t67 t32 t64 t47 t6 t13 t25 t47 t2 t78
long t11 t69 t51 t66 t43 t73 t46 t78 t56 t75 t36 t60 t27 t73
long t17 t51 t22 t58 t0 t44 t51 t46 t12 t20 t73 t24 t12
long t9 t54 t27 t31 t71 t14 t38 t72 t13 t17 t18 t66 t33 t12
mid t33 t53 t43 t33 t9 t36 t3
long t47 t54 t60 t51 t19 t34 t65 t56 t22 t17 t25 t49 t32
long t30 t77 t17 t70 t75 t27 t19 t40 t22 t2 t13 t21 t24
mid t25 t49 t50 t29 t14 t30 t31
mid t45 t6 t43 t61 t69 t10 t32 t57
short t38 t22 t71 t16 t79
mid t31 t45 t56 t2 t78 t54 t8 t67 t25 t75
mid t19 t32 t49 t58 t64 t13 t3 t47 t38
long t1 t25 t1 t8 t32 t23 t4 t22 t39 t42 t59 t51 t48
long t76 t53 t71 t67 t17 t60 t79 t40 t62 t14 t18 t39 t63 t63
short t46 t49 t21
long t35 t70 t69 t66 t56 t30 t23 t75 t8 t0 t2
short t18 t4 t34
mid t55 t11 t3 t3 t49 t55 t36 t16 t77
long t9 t16 t61 t20 t41 t36 t51 t39 t25 t6 t50 t29 t74 t61
long t77 t32 t21 t72 t7 t57 t49 t64 t53 t26 t29 t13 t34 t66
mid t70 t38 t34 t79 t49 t37 t11 t67 t68
long t76 t41 t62 t64 t44 t27 t45 t73 t40 t12 t67 t17
short t33 t4 t29 t56 t59 t28
mid t71 t49 t31 t54 t28 t69 t54 t60 t39 t40
long t25 t38 t5 t42 t22 t19 t79 t50 t58 t36 t3 t15 t24
short t74 t46 t31 t27 t30 t57
long t46 t61 t66 t61 t63 t9 t9 t8 t42 t76 t55
long t46 t31 t62 t3 t40 t21 t17 t16 t16 t31 t74 t2 t17 t12
long t3 t37 t70 t65 t12 t42 t57 t78 t71 t44 t36 t69 t32 t49 t43
long t20 t15 t56 t70 t21 t21 t30 t22 t65 t77 t19 t44 t37 t22
long t12 t10 t0 t65 t27 t32 t53 t14 t13 t30 t68 t78 t34 t46 t26
long t26 t36 t64 t1 t19 t28 t23 t71 t42 t57 t18
long t15 t57 t76 t42 t37 t37 t29 t4 t30 t15 t52
short t62 t38 t11 t8
mid t46 t72 t79 t49 t13 t73 t22 t47
short t67 t11 t59
long t11 t62 t40 t66 t77 t27 t36 t48 t56 t12 t9 t17 t29 t25 t65
long t34 t57 t61 t11 t21 t44 t20 t31 t68 t60 t3
long t9 t12 t34 t9 t63 t0 t63 t60 t7 t65 t2 t16 t5
short t25 t21 t55 t63 t47 t67
long t57 t50 t23 t10 t20 t4 t56 t44 t5 t44 t35 t1
long t56 t31 t46 t6 t55 t47 t36 t73 t44 t43 t57 t32
long t78 t38 t70 t38 t40 t66 t57 t37 t19 t50 t22 t32 t42
short t17 t66 t37 t50 t30
mid t9 t64 t42 t78 t46 t62 t39
short t56 t63 t33
short t9 t24 t69 t57 t54 t50
long t16 t8 t46 t12 t21 t19 t30 t36 t22 t77 t69
long t62 t15 t37 t12 t10 t40 t57 t38 t3 t37 t64 t49
short t4 t44 t53 t40 t54
short t9 t5 t66 t57
mid t13 t62 t46 t58 t29 t62 t47 t19 t25 t26
short t46 t65 t23
long t50 t41 t17 t27 t3 t16 t2 t69 t62 t78 t66 t41 t41 t52 t64
mid t38 t47 t27 t1 t27 t10 t21
mid t47 t72 t78 t5 t30 t38 t5 t12 t37 t44
short t44 t19 t7
mid t57 t74 t37 t31 t7 t40 t61 t37 t71 t59
short t30 t18 t54 t6
long t5 t49 t38 t42 t17 t14 t71 t66 t16 t72 t40 t29 t12
long t27 t21 t5 t36 t36 t66 t5 t43 t62 t12 t37 t36 t51 t11 t61
long t50 t16 t44 t42 t24 t61 t23 t47 t62 t15 t39 t42 t61
short t35 t17 t46 t29 t10
short t54 t77 t71 t58 t11 t17
mid t18 t7 t34 t68 t35 t43 t38
long t8 t40 t65 t43 t73 t40 t3 t59 t53 t34 t46 t75
short t1 t70 t23
mid t50 t32 t46 t79 t7 t33 t56 t47 t46
mid t41 t12 t15 t40 t17 t0 t8
long t77 t22 t71 t33 t65 t24 t27 t15 t62 t55 t52 t44
mid t44 t37 t14 t73 t14 t2 t56 t64 t10 t15
mid t54 t20 t18 t61 t40 t23 t14 t39 t76 t66
long t53 t65 t11 t27 t72 t51 t20 t70 t61 t4 t54
long t71 t7 t15 t11 t16 t29 t53 t22 t59 t66 t14 t79 t20 t28 t61
long t33 t32 t47 t27 t55 t17 t13 t41 t33 t59 t53 t52 t29
short t41 t50 t5 t42 t34 t14
long t9 t60 t70 t64 t11 t16 t25 t62 t40 t39 t64 t52 t37 t25 t59
short t51 t10 t77 t5 t36 t18
long t7 t15 t30 t32 t70 t24 t67 t44 t47 t77 t2 t14
long t45 t38 t76 t78 t29 t15 t46 t42 t10 t50 t72 t54 t25
long t79 t76 t6 t23 t55 t69 t24 t79 t4 t4 t0 t65 t76 t21
short t38 t43 t10 t29
mid t23 t10 t35 t41 t53 t50 t61 t25
mid t46 t33 t47 t34 t65 t40 t74 t40
long t54 t39 t20 t8 t61 t19 t31 t76 t5 t42 t51 t58 t28
long t10 t48 t31 t60 t53 t47 t31 t0 t8 t35 t11
long t10 t3 t45 t27 t34 t3 t62 t18 t21 t61 t37 t11 t10
mid t41 t46 t58 t51 t72 t38 t9 t22
mid t36 t68 t66 t18 t49 t44 t15 t75 t17 t7
mid t63 t57 t33 t44 t33 t21 t75 t28 t79
long t32 t46 t9 t34 t22 t49 t22 t51 t7 t2 t29 t40
long t78 t39 t42 t58 t13 t8 t17 t64 t48 t12 t56 t65 t50 t10
mid t65 t78 t24 t75 t62 t39 t46
long t35 t41 t34 t1 t47 t18 t37 t22 t1 t64 t13 t77
short t50 t48 t35 t18 t15
long t19 t48 t58 t36 t63 t12 t64 t32 t39 t5 t32 t47 t67 t27 t71
mid t2 t0 t78 t18 t44 t79 t28 t74 t68
short t1 t17 t24 t51
mid t79 t8 t13 t41 t28 t15 t20 t15 t51 t59
short t79 t12 t18 t44
short t14 t32 t27 t48
short t69 t33 t51
mid t60 t48 t4 t70 t56 t29 t55 t66
short t63 t32 t40
long t39 t57 t60 t21 t25 t59 t3 t12 t76 t38 t70 t13 t50 t75
long t20 t67 t69 t36 t17 t28 t66 t18 t38 t6 t17 t10 t31 t76
long t31 t70 t15 t27 t61 t56 t76 t53 t70 t55 t30 t26 t64 t10 t12
long t39 t77 t5 t35 t31 t57 t28 t66 t10 t44 t34 t29
long t7 t66 t40 t13 t75 t27 t27 t51 t38 t33 t10 t72 t73
mid t75 t60 t1 t28 t18 t69 t54 t28 t29 t5
long t17 t56 t43 t44 t11 t73 t31 t41 t7 t75 t32 t64 t62 t40 t52
long t24 t52 t14 t23 t32 t42 t9 t18 t1 t35 t5 t40
long t69 t35 t17 t30 t20 t47 t44 t21 t11 t6 t65 t26 t21 t15 t55
mid t4 t62 t49 t75 t70 t64 t72 t41 t2
mid t6 t40 t75 t37 t77 t46 t47 t47
short t74 t74 t75 t49 t28
long t58 t45 t52 t78 t24 t58 t24 t14 t59 t64 t57 t71 t11
short t71 t30 t28
long t28 t66 t21 t14 t56 t61 t16 t35 t42 t73 t47
mid t38 t71 t76 t77 t45 t52 t76 t61 t31 t67
short t46 t68 t19 t11
short t8 t31 t29 t3
short t28 t22 t65
long t61 t23 t63 t34 t49 t37 t6 t32 t33 t68 t61
mid t12 t17 t3 t40 t40 t52 t60 t72 t45 t21
short t79 t37 t24 t75
long t77 t8 t31 t4 t31 t44 t43 t57 t24 t14 t12 t33
mid t18 t78 t14 t46 t22 t30 t24
long t44 t41 t10 t7 t33 t23 t73 t66 t79 t79 t20 t22 t10 t37 t59
short t8 t3 t47 t19 t4
long t67 t46 t59 t1 t9 t58 t22 t73 t9 t50 t35 t3 t69 t15
short t73 t61 t19 t6 t26
long t31 t18 t76 t31 t35 t24 t27 t74 t50 t41 t65 t2 t30 t41
mid t7 t21 t51 t36 t18 t15 t62 t72
short t58 t3 t44 t28
long t20 t21 t12 t26 t18 t6 t4 t40 t55 t21 t26 t71 t48 t74
long t24 t61 t38 t25 t62 t32 t31 t16 t51 t34 t52 t29 t39
short t29 t75 t62
short t1 t55 t72 t28 t64
mid t29 t0 t20 t51 t78 t60 t77 t67
long t38 t76 t60 t62 t51 t43 t29 t57 t11 t12 t24 t44 t58 t59 t67
short t53 t23 t3
long t77 t54 t40 t33 t43 t62 t15 t45 t78 t48 t19 t45 t2
mid t48 t30 t34 t78 t24 t65 t30 t46 t8
mid t45 t44 t69 t53 t44 t29 t58 t49
mid t18 t40 t7 t57 t76 t23 t62 t46 t79
long t27 t28 t62 t6 t5 t37 t31 t33 t10 t43 t61 t56
mid t35 t23 t3 t3 t1 t11 t23 t16 t70
long t43 t74 t1 t19 t69 t44 t37 t11 t4 t65 t25 t50 t45
long t38 t48 t26 t65 t58 t44 t57 t77 t58 t68 t0 t14 t21 t30 t36
mid t17 t24 t41 t52 t39 t77 t30 t21 t10 t34
short t38 t5 t61 t45 t46
mid t74 t46 t73 t2 t12 t1 t56 t46 t31 t12
short t78 t6 t55 t48 t7
mid t24 t78 t58 t24 t77 t18 t79 t55 t58 t5
long t39 t13 t2 t23 t0 t50 t50 t27 t43 t24 t57
short t51 t65 t1 t35 t29
mid t29 t79 t60 t65 t34 t23 t56 t74 t75
short t73 t15 t8 t77 t40
mid t76 t60 t55 t45 t33 t78 t78
long t76 t55 t61 t59 t59 t29 t2 t19 t66 t53 t12 t39
short t13 t48 t35 t1
mid t74 t9 t57 t32 t49 t5 t49 t30
long t44 t45 t73 t5 t17 t16 t29 t75 t38 t41 t28 t60 t7 t18 t57
long t35 t79 t68 t53 t64 t75 t77 t45 t62 t5 t68 t52 t59 t74 t56
long t25 t46 t66 t32 t51 t8 t17 t64 t20 t7 t7 t67 t66 t17
long t64 t35 t33 t3 t33 t71 t69 t9 t29 t21 t25 t68 t7
short t13 t65 t30 t23
short t65 t40 t25 t14
mid t1 t29 t36 t59 t64 t23 t36 t39 t14
long t17 t21 t56 t22 t76 t27 t12 t33 t17 t53 t38 t26
long t4 t52 t79 t54 t75 t14 t64 t26 t79 t50 t5
mid t29 t74 t23 t3 t11 t58 t49
short t29 t68 t11 t52
short t72 t63 t54 t3
mid t64 t57 t46 t9 t0 t77 t58
long t47 t20 t78 t61 t52 t38 t11 t7 t78 t20 t53 t26 t78 t27
short t1 t43 t56 t8
long t28 t74 t49 t35 t13 t58 t43 t56 t51 t66 t32 t30 t27 t31 t42
long t17 t66 t65 t57 t76 t79 t35 t39 t21 t51 t21 t67
mid t44 t56 t36 t15 t7 t44 t9 t58 t24 t62
short t30 t47 t19 t26 t67 t59
long t61 t62 t8 t26 t48 t66 t53 t69 t52 t64 t76 t9 t15
short t49 t15 t20 t8
short t1 t72 t58
long t50 t68 t73 t52 t8 t21 t64 t40 t12 t52 t37 t44
mid t14 t66 t25 t1 t57 t73 t78 t24
long t33 t18 t29 t54 t60 t78 t4 t42 t45 t10 t14
short t57 t66 t78 t16
long t51 t62 t45 t32 t20 t13 t57 t68 t21 t50 t19 t7 t22 t29 t31
long t16 t68 t26 t76 t50 t39 t0 t27 t31 t63 t31 t50 t3 t70 t2
mid t44 t69 t44 t0 t18 t2 t69 t41 t17 t19
long t61 t6 t49 t0 t61 t6 t10 t74 t70 t64 t11 t10 t29 t13
mid t18 t64 t12 t6 t79 t57 t13
mid t65 t10 t62 t44 t17 t58 t59 t66
short t75 t26 t44 t42 t42 t60
short t16 t43 t2 t24
long t47 t27 t38 t76 t17 t18 t66 t35 t68 t63 t67 t68 t37 t61
short t29 t20 t65 t50 t17 t11
short t38 t32 t53 t37 t65 t69
long t75 t22 t66 t30 t33 t39 t62 t12 t11 t37 t0 t43 t20 t29
long t21 t79 t57 t53 t8 t55 t54 t16 t62 t69 t67 t8 t69 t50 t69
long t19 t34 t30 t69 t77 t59 t43 t2 t41 t6 t67 t72 t37 t69
short t79 t65 t31 t48
short t41 t21 t24 t6 t67 t30
long t22 t22 t33 t48 t19 t69 t67 t44 t79 t68 t38 t13 t47 t12 t8
mid t27 t20 t37 t31 t22 t73 t10 t71 t62 t53
short t24 t12 t63 t30
long t25 t47 t5 t78 t18 t45 t74 t36 t9 t72 t43 t12 t11 t59 t72
short t79 t45 t17 t30
long t37 t10 t67 t19 t43 t64 t13 t9 t30 t71 t17 t76
short t20 t3 t23
mid t44 t19 t51 t47 t10 t33 t65 t41
long t20 t44 t43 t24 t7 t16 t57 t43 t31 t13 t74 t6 t19 t42 t79
long t8 t11 t18 t43 t37 t21 t27 t33 t75 t71 t23 t61 t37 t45 t42
mid t26 t78 t10 t36 t49 t41 t26 t9 t54
short t67 t40 t57 t34
short t55 t54 t62 t17 t79 t75
short t31 t8 t79 t72 t74
short t17 t34 t7 t25 t58 t68
long t50 t18 t62 t16 t12 t71 t48 t9 t9 t78 t67 t14 t72 t76 t59
short t15 t33 t28 t37 t73 t73
long t14 t25 t47 t55 t50 t76 t66 t78 t26 t34 t18 t13
long t65 t56 t61 t7 t68 t14 t57 t61 t42 t30 t0
short t47 t38 t77 t29 t61
short t73 t70 t13 t7 t45 t17
long t72 t63 t63 t10 t71 t26 t28 t30 t74 t69 t76 t59 t30
short t69 t26 t2
short t10 t36 t26 t54 t67
mid t53 t18 t9 t33 t4 t31 t0 t7 t5 t57
mid t64 t48 t13 t9 t35 t4 t6
short t65 t58 t66 t17 t77 t74
mid t7 t75 t38 t32 t56 t60 t0 t43 t38 t22
mid t53 t3 t53 t78 t3 t32 t25 t27 t70 t68
mid t34 t54 t58 t17 t47 t67 t15
short t32 t12 t29 t36
long t55 t55 t1 t33 t49 t66 t56 t36 t49 t36 t50 t68 t69 t29
long t72 t18 t49 t18 t39 t76 t77 t44 t73 t77 t29 t72
long t44 t12 t4 t23 t32 t47 t59 t3 t59 t50 t39 t65 t14
long t17 t11 t28 t21 t33 t75 t61 t9 t66 t78 t36 t24
mid t49 t66 t54 t13 t71 t76 t49 t7
short t28 t66 t66 t6 t50
long t12 t9 t3 t28 t54 t77 t63 t3 t55 t37 t25 t77
mid t31 t44 t73 t38 t9 t57 t15 t58
short t41 t15 t12 t2 t75
long t17 t63 t38 t31 t77 t54 t3 t29 t66 t38 t70 t38 t23
short t0 t59 t72 t33
mid t21 t34 t1 t48 t72 t21 t44 t36 t47
mid t23 t22 t0 t75 t40 t27 t25 t78
mid t44 t73 t73 t75 t49 t33 t22 t76 t3
mid t27 t30 t37 t28 t29 t31 t26 t72
long t19 t46 t62 t24 t19 t2 t47 t3 t20 t75 t56
mid t29 t19 t62 t9 t71 t7 t64 t8 t1
mid t21 t9 t54 t76 t50 t56 t31 t55
long t69 t73 t67 t9 t46 t76 t65 t24 t35 t56 t12
long t48 t15 t2 t18 t74 t32 t26 t70 t34 t68 t67 t51 t74 t74 t18
short t43 t43 t64
long t29 t44 t4 t26 t61 t15 t58 t47 t45 t43 t17 t28 t39 t21
mid t42 t53 t39 t60 t52 t34 t25 t2 t67
short t75 t67 t62 t6 t48 t23
mid t55 t73 t20 t40 t49 t7 t53 t2
long t23 t44 t68 t34 t24 t66 t5 t14 t75 t9 t16 t25 t29 t55 t47
mid t68 t3 t68 t52 t31 t54 t19 t50 t68
long t69 t65 t51 t30 t3 t41 t33 t26 t56 t12 t15 t50 t20 t65
long t72 t59 t4 t24 t53 t75 t0 t69 t2 t20 t7
short t57 t18 t31 t35 t70 t20
long t57 t9 t56 t32 t51 t71 t12 t72 t70 t5 t26 t11 t43
short t30 t18 t14 t16
short t26 t28 t64 t74 t38
short t76 t79 t76 t37
long t3 t71 t30 t8 t3 t60 t49 t62 t58 t45 t63 t14 t0 t22
mid t62 t65 t40 t74 t34 t60 t15 t59 t9 t51
long t8 t67 t53 t6 t74 t54 t58 t38 t24 t28 t66 t38 t59 t25
short t51 t47 t70
short t46 t64 t18
mid t17 t56 t11 t8 t13 t62 t4
short t41 t12 t64 t5 t40
long t65 t55 t10 t56 t36 t7 t68 t26 t26 t18 t56 t21
mid t79 t62 t73 t46 t54 t63 t17
mid t68 t39 t48 t30 t31 t36 t32 t75
long t39 t60 t6 t0 t23 t65 t19 t23 t63 t45 t63 t21
mid t28 t30 t30 t69 t27 t74 t44 t16 t20
mid t29 t53 t25 t11 t7 t8 t18 t69 t13
short t59 t44 t12 t68 t14 t64
short t77 t19 t77 t75 t61 t66
mid t63 t53 t15 t44 t62 t38 t2 t66
long t67 t8 t37 t30 t69 t70 t11 t36 t71 t22 t17 t25 t58
mid t41 t15 t70 t2 t12 t51 t50 t44 t33
mid t79 t5 t25 t71 t5 t43 t41 t64 t35 t36
mid t70 t45 t70 t36 t79 t11 t7 t70
long t71 t25 t36 t61 t13 t31 t38 t6 t5 t19 t33 t11 t2
short t33 t26 t64 t31
long t24 t2 t5 t79 t63 t45 t16 t58 t15 t4 t70 t51 t51
short t65 t68 t78 t65 t52
mid t11 t79 t30 t22 t57 t3 t41 t33 t35 t21
long t45 t71 t73 t54 t42 t54 t74 t25 t21 t79 t66 t22 t49 t31 t50
mid t38 t40 t32 t46 t78 t9 t46 t11
long t23 t66 t61 t15 t70 t71 t19 t36 t75 t13 t21 t10 t71 t8 t19
long t64 t49 t55 t79 t65 t49 t37 t70 t73 t52 t67 t56 t41 t28 t64
mid t52 t29 t15 t38 t31 t50 t37 t32
short t20 t22 t53 t27 t36 t67
long t55 t50 t48 t13 t72 t18 t46 t30 t47 t52 t79 t66 t66 t13
mid t77 t29 t78 t40 t2 t37 t71 t50
short t47 t16 t11 t65
short t14 t32 t73 t54 t23 t24
long t20 t15 t50 t77 t42 t8 t51 t68 t27 t23 t28
long t28 t52 t43 t11 t32 t25 t47 t50 t1 t35 t31
long t71 t62 t13 t61 t73 t22 t42 t62 t79 t3 t4 t68 t49 t17 t29
mid t32 t69 t40 t72 t75 t72 t0
short t19 t42 t69
long t61 t39 t11 t79 t31 t67 t70 t39 t44 t3 t2 t77 t31
mid t22 t31 t51 t73 t39 t53 t76 t36 t67
long t64 t72 t42 t49 t44 t51 t14 t7 t52 t70 t20 t12 t54 t38
long t18 t18 t78 t15 t52 t68 t67 t34 t35 t67 t42 t41 t18 t56
long t4 t55 t10 t46 t23 t16 t3 t3 t54 t43 t54 t14 t31
mid t14 t57 t34 t62 t41 t19 t37 t55 t31 t66
long t6 t72 t10 t52 t35 t2 t60 t6 t7 t51 t12 t61
short t25 t17 t21
short t33 t70 t11
short t26 t74 t54
long t79 t79 t69 t37 t65 t33 t33 t19 t41 t3 t16 t43 t26 t21 t17
long t75 t36 t71 t54 t69 t49 t73 t19 t79 t47 t27 t25
short t7 t17 t58 t55
short t19 t26 t17 t60
short t40 t5 t41 t29
long t11 t41 t56 t39 t43 t42 t12 t74 t21 t21 t63 t55
short t37 t22 t78
mid t63 t79 t47 t20 t20 t2 t63
mid t19 t20 t36 t43 t22 t10 t52 t61 t72
short t77 t71 t36 t19 t3 t69
long t78 t4 t19 t73 t11 t4 t79 t13 t5 t41 t67 t58
mid t36 t3 t44 t64 t47 t25 t39 t32 t55 t64
long t48 t17 t2 t25 t20 t42 t0 t41 t50 t36 t9 t32
mid t61 t20 t10 t71 t20 t59 t48 t1
short t26 t13 t18
mid t74 t62 t61 t8 t30 t44 t23 t39 t78 t48
mid t57 t46 t23 t73 t43 t31 t73 t8 t44
long t77 t64 t8 t18 t27 t24 t49 t34 t50 t74 t69 t53 t74
mid t31 t69 t31 t50 t4 t65 t65 t59 t32
short t65 t20 t20 t61 t12
mid t58 t32 t7 t36 t44 t68 t68 t7 t21
mid t38 t36 t38 t73 t77 t45 t11 t52 t79
short t54 t54 t62 t6 t45 t76
mid t18 t13 t1 t6 t18 t27 t70 t79
mid t5 t75 t20 t46 t65 t23 t65
long t49 t32 t69 t52 t11 t53 t8 t37 t37 t22 t31 t72 t41 t12
long t49 t9 t28 t67 t27 t55 t36 t34 t0 t75 t8 t57 t77
short t28 t45 t64
long t72 t49 t8 t52 t73 t0 t27 t7 t38 t30 t56 t46
short t61 t7 t15
short t76 t10 t40 t63
long t68 t39 t59 t14 t49 t79 t21 t3 t20 t27 t63 t62 t58 t67 t38
short t22 t71 t63 t47 t29 t79
mid t22 t0 t8 t59 t73 t38 t54
short t16 t24 t66 t48
long t34 t10 t47 t2 t21 t12 t68 t25 t5 t9 t17 t49 t62 t28 t3
long t43 t10 t19 t69 t54 t6 t49 t4 t56 t41 t5 t67
short t11 t22 t64 t67
long t44 t19 t8 t64 t77 t19 t4 t25 t16 t57 t65 t36 t37
short t13 t53 t62 t4 t69
short t7 t70 t34 t36 t63
short t57 t59 t74 t37 t21 t13
short t64 t12 t37 t13
long t9 t18 t15 t13 t2 t11 t39 t18 t71 t75 t68 t24 t41 t27
long t78 t65 t44 t30 t77 t1 t30 t75 t68 t4 t49 t56 t62
long t74 t7 t57 t14 t2 t55 t10 t51 t1 t57 t9 t56 t33 t61
long t61 t52 t9 t33 t34 t45 t78 t62 t37 t74 t65 t53
long t25 t44 t25 t66 t52 t27 t49 t69 t2 t55 t40 t33
mid t31 t33 t57 t3 t19 t53 t69
short t56 t25 t23 t33
short t50 t19 t29 t76
mid t27 t29 t2 t25 t65 t5 t78 t54
mid t56 t78 t71 t20 t37 t56 t77 t18 t49
mid t64 t19 t25 t26 t19 t14 t60
short t62 t29 t57 t78 t75 t77
short t75 t9 t13 t72 t31 t21
short t58 t47 t39
mid t30 t5 t65 t58 t75 t1 t37 t25 t17 t27
mid t70 t39 t33 t51 t46 t6 t49 t62 t62 t30
mid t1 t61 t64 t32 t26 t66 t5 t20 t14 t14
mid t38 t22 t13 t9 t75 t21 t53 t39
mid t20 t20 t27 t39 t9 t49 t78 t79 t61 t79
mid t6 t24 t57 t12 t62 t67 t72 t2 t20 t76
mid t60 t8 t2 t19 t20 t57 t54 t67
mid t18 t76 t23 t23 t58 t72 t79 t76 t70
short t59 t37 t35 t9 t38
short t26 t8 t44 t51 t39 t42
long t49 t18 t36 t65 t72 t75 t43 t12 t6 t2 t63 t32 t1
mid t36 t51 t51 t72 t18 t58 t38
mid t39 t11 t32 t17 t36 t25 t41 t50 t60
short t9 t42 t79 t73 t52 t55
short t6 t8 t25
long t5 t73 t71 t63 t43 t42 t74 t12 t7 t15 t24 t28 t52
long t77 t6 t41 t10 t61 t18 t31 t25 t4 t65 t18 t65 t67 t37 t73
short t53 t59 t41 t45 t18 t53
long t66 t48 t67 t14 t35 t65 t23 t53 t68 t78 t28 t15 t64 t12
long t72 t64 t69 t36 t35 t25 t30 t32 t66 t65 t71 t52 t27 t34 t6
short t39 t63 t0 t63 t26
long t32 t1 t17 t51 t78 t59 t69 t5 t61 t0 t47 t39 t10 t39 t49
short t19 t72 t69 t13 t15
mid t58 t56 t35 t69 t40 t64 t28 t16
mid t47 t30 t63 t69 t44 t58 t58 t61
mid t5 t63 t52 t11 t11 t13 t37 t32
long t69 t3 t10 t52 t26 t74 t51 t2 t34 t71 t59 t10
long t67 t16 t64 t70 t7 t46 t30 t25 t72 t33 t35 t67 t7 t42
short t24 t70 t75 t52
short t68 t14 t73 t69
short t34 t74 t4 t71 t27
mid t6 t23 t73 t40 t11 t34 t18
long t41 t61 t47 t71 t55 t57 t7 t3 t68 t58 t16 t64 t48 t31 t66
mid t72 t36 t30 t19 t27 t44 t16 t13 t70
mid t37 t65 t53 t11 t0 t72 t57 t8
short t13 t77 t70 t52 t36 t10
long t28 t71 t70 t60 t48 t40 t2 t66 t50 t53 t37
mid t35 t79 t26 t14 t37 t61 t34 t18
mid t8 t11 t29 t49 t34 t13 t17
short t70 t2 t50 t68
short t37 t61 t22 t57 t39
long t11 t9 t41 t66 t11 t19 t45 t16 t15 t69 t35 t6 t34
mid t79 t45 t20 t23 t44 t54 t32 t8
mid t57 t77 t52 t3 t5 t70 t48 t68 t36
mid t33 t56 t62 t6 t79 t70 t75 t25 t5
long t1 t56 t58 t12 t51 t77 t69 t55 t55 t19 t32 t70 t3 t3
long t68 t35 t39 t8 t28 t5 t45 t15 t59 t4 t41
long t53 t54 t74 t69 t54 t5 t8 t0 t60 t33 t16 t30 t35
mid t32 t59 t50 t36 t13 t27 t76 t40
long t24 t64 t72 t38 t71 t2 t26 t63 t48 t8 t16 t11
mid t67 t24 t48 t25 t52 t43 t37 t37
short t26 t38 t7 t72
short t28 t62 t59 t35
mid t44 t21 t17 t42 t17 t45 t50 t62 t10 t53
long t4 t42 t51 t56 t2 t68 t35 t75 t75 t30 t26 t66 t55 t40 t14
long t9 t68 t21 t27 t73 t52 t75 t60 t33 t1 t12 t9 t54 t46 t48
mid t72 t46 t4 t73 t42 t56 t61
mid t52 t9 t15 t16 t32 t65 t51 t22 t7 t15
mid t23 t62 t68 t67 t63 t63 t43
long t16 t55 t49 t1 t67 t21 t54 t55 t47 t73 t53 t76
mid t61 t77 t55 t39 t25 t17 t69
mid t2 t55 t54 t58 t44 t64 t53 t69
short t57 t73 t75
short t52 t32 t27
mid t39 t18 t65 t12 t36 t61 t32 t78 t39
mid t49 t34 t44 t22 t2 t43 t12 t19 t48
short t10 t51 t18 t2
long t45 t10 t64 t35 t18 t52 t70 t17 t14 t67 t65 t71 t2 t79 t66
long t11 t26 t67 t56 t32 t70 t18 t30 t40 t1 t77
mid t40 t40 t57 t5 t17 t50 t69 t35
mid t55 t18 t4 t70 t14 t2 t56 t54 t48
mid t30 t21 t77 t29 t75 t59 t73 t67 t34 t24
short t3 t29 t66 t52 t45
mid t46 t73 t6 t44 t56 t48 t26
mid t46 t69 t73 t70 t23 t34 t5
long t78 t12 t15 t50 t72 t34 t77 t34 t27 t71 t70 t27 t19
short t14 t47 t31 t61 t27
long t53 t74 t74 t16 t6 t11 t8 t28 t13 t41 t28 t5
long t13 t59 t58 t57 t55 t51 t27 t19 t28 t70 t5 t78 t79 t44
short t25 t27 t28 t71 t71
long t64 t77 t65 t27 t60 t28 t20 t63 t44 t34 t6
mid t61 t70 t71 t25 t15 t42 t58 t23 t76 t61
long t75 t72 t69 t64 t71 t37 t39 t2 t39 t23 t2 t74 t30 t46 t9
long t77 t17 t5 t13 t20 t64 t9 t18 t57 t75 t0 t6 t72
short t10 t21 t78
long t27 t39 t12 t26 t54 t66 t5 t65 t24 t41 t43 t65 t77 t51 t27
short t53 t74 t32 t67
long t33 t66 t69 t3 t24 t18 t1 t57 t15 t61 t0 t47 t59 t32 t45
long t66 t12 t48 t17 t20 t34 t61 t20 t25 t1 t45 t68 t34 t17 t68
mid t39 t30 t15 t6 t44 t23 t43 t46 t41 t4
mid t78 t38 t75 t57 t60 t70 t40 t25 t23 t36
long t43 t62 t56 t28 t20 t11 t7 t77 t35 t45 t7 t57 t76 t23 t26
mid t49 t64 t15 t24 t32 t27 t38 t10 t70 t23
long t36 t57 t56 t2 t62 t48 t59 t52 t43 t67 t42
short t75 t56 t63
short t9 t51 t16
mid t42 t70 t42 t25 t70 t14 t56
long t67 t46 t74 t66 t69 t9 t31 t60 t17 t54 t24 t54 t68 t72 t31
short t22 t14 t54 t6 t38 t3
short t47 t39 t63 t14 t48
short t75 t14 t55 t46 t2 t12
short t4 t49 t55 t36 t6
long t48 t19 t32 t50 t75 t53 t3 t14 t27 t26 t3 t14 t71 t14
mid t13 t68 t24 t21 t46 t47 t65 t68 t23 t78
long t39 t42 t76 t71 t72 t45 t76 t28 t42 t15 t47
mid t38 t47 t20 t47 t27 t67 t19 t16 t30
short t8 t7 t52 t50 t11
mid t68 t25 t50 t31 t16 t27 t64
long t70 t37 t27 t30 t27 t52 t73 t71 t31 t48 t71 t64
long t61 t60 t29 t32 t59 t10 t19 t66 t33 t1 t67 t12 t66 t41
long t17 t66 t61 t29 t71 t42 t34 t20 t13 t61 t53 t50 t5
long t67 t67 t79 t47 t59 t19 t29 t64 t45 t23 t6 t66
mid t27 t65 t38 t68 t3 t72 t19 t14
long t32 t18 t43 t74 t52 t70 t13 t18 t64 t6 t67 t69
long t35 t75 t7 t75 t30 t13 t32 t60 t75 t23 t74 t30 t73 t13 t14
mid t35 t51 t77 t55 t22 t33 t9 t20
long t6 t55 t65 t38 t62 t0 t60 t5 t25 t50 t4 t52 t78 t53
mid t34 t8 t23 t69 t35 t41 t67 t63 t11
long t30 t20 t12 t43 t54 t32 t30 t71 t5 t36 t4 t26 t3 t19
long t70 t38 t64 t57 t44 t62 t8 t13 t32 t26 t37 t26
long t55 t57 t3 t22 t48 t79 t38 t5 t24 t31 t32 t32 t75
short t49 t51 t19
long t9 t9 t71 t23 t54 t43 t62 t31 t78 t24 t57 t63
short t14 t41 t29 t28
short t50 t15 t5 t11 t28
long t35 t47 t46 t56 t9 t3 t68 t51 t43 t12 t47 t62 t22
long t0 t28 t68 t10 t49 t60 t29 t7 t10 t54 t32 t53
mid t4 t33 t66 t63 t51 t25 t24
short t44 t4 t6 t3 t45 t58
short t62 t24 t20 t10 t34
long t37 t14 t13 t57 t64 t63 t13 t25 t52 t68 t34 t63
short t55 t43 t63 t9 t17
short t42 t18 t31
mid t28 t78 t28 t36 t70 t74 t21
long t49 t64 t23 t28 t20 t4 t63 t75 t58 t70 t66
long t75 t53 t79 t22 t37 t51 t13 t79 t5 t21 t77 t48 t38
long t12 t38 t20 t73 t12 t45 t2 t53 t68 t7 t22
short t69 t18 t72
mid t58 t41 t50 t52 t7 t73 t12 t51 t55 t27
long t3 t2 t64 t26 t9 t9 t33 t23 t52 t22 t20 t53 t27 t44
short t45 t20 t76
short t71 t12 t77 t2 t70 t0
mid t64 t25 t30 t74 t62 t31 t0 t39 t67
long t65 t60 t28 t13 t8 t53 t18 t71 t19 t71 t5 t58 t14 t48
long t27 t60 t39 t77 t57 t55 t36 t45 t7 t26 t18 t43
short t5 t43 t52 t24 t3 t73
short t11 t10 t32 t18 t40 t31
long t53 t9 t60 t37 t64 t4 t4 t42 t67 t5 t71 t22 t71 t32 t3
short t31 t30 t22 t79 t14 t50
long t0 t4 t22 t70 t62 t26 t19 t8 t65 t14 t0 t54 t16
long t0 t37 t63 t39 t40 t38 t20 t68 t63 t15 t4 t19 t3 t4 t8
short t0 t34 t71
long t9 t49 t34 t47 t40 t26 t21 t36 t55 t51 t40 t2 t59
mid t19 t61 t78 t64 t45 t36 t39 t15 t55 t51
mid t63 t67 t79 t40 t64 t26 t71 t26
long t52 t67 t66 t52 t0 t66 t24 t9 t31 t50 t67 t42 t8 t9 t59
short t23 t64 t1 t44
mid t10 t54 t12 t76 t75 t17 t10 t0
short t38 t52 t12
short t15 t45 t6 t5 t52 t56
short t32 t75 t19 t31 t57
long t51 t22 t37 t42 t77 t54 t20 t56 t62 t57 t32 t42
short t63 t56 t49 t16 t21 t32
mid t34 t46 t45 t26 t47 t59 t8 t8
long t53 t21 t29 t73 t60 t40 t32 t49 t27 t46 t14 t10 t41
long t35 t15 t44 t11 t39 t59 t18 t21 t79 t4 t11 t27 t39
long t51 t51 t59 t79 t42 t38 t67 t13 t18 t75 t13 t62 t8
short t17 t49 t17 t69
short t31 t2 t23
mid t11 t20 t50 t75 t67 t32 t38 t51 t19
mid t5 t38 t43 t45 t39 t26 t46 t12 t78
short t60 t45 t59 t48
long t5 t42 t57 t37 t54 t3 t13 t59 t55 t5 t8 t22 t35 t18
short t66 t20 t22 t50 t73
mid t0 t61 t33 t30 t30 t79 t3 t34 t3 t79
mid t66 t14 t63 t28 t43 t35 t66 t36 t39 t25
long t67 t23 t70 t52 t38 t52 t32 t37 t71 t7 t35 t20 t53
short t53 t40 t40 t68 t74 t37
mid t65 t15 t75 t4 t36 t76 t28
short t12 t28 t68 t71 t52 t0
long t51 t37 t4 t51 t23 t47 t55 t37 t38 t47 t21 t50 t36
long t28 t5 t20 t70 t26 t53 t7 t76 t0 t17 t8 t38 t59
short t11 t46 t21 t26
long t63 t57 t15 t1 t63 t25 t40 t16 t34 t48 t69 t75 t79 t77 t64
mid t53 t78 t17 t62 t1 t22 t33 t8 t12
long t78 t23 t39 t76 t76 t1 t41 t53 t36 t68 t73 t41 t34 t42 t19
long t1 t77 t66 t63 t51 t74 t51 t41 t34 t70 t30 t53
long t75 t18 t73 t5 t30 t52 t65 t63 t22 t24 t62
mid t33 t8 t31 t27 t18 t44 t24
mid t18 t68 t4 t53 t43 t38 t30 t56
mid t51 t25 t33 t70 t23 t69 t16 t48 t55 t62
mid t79 t41 t54 t63 t48 t41 t59 t36 t48
mid t57 t35 t33 t43 t53 t22 t51 t52
long t4 t36 t43 t9 t77 t20 t54 t66 t12 t56 t1 t33 t29 t0
long t12 t18 t19 t6 t62 t5 t47 t64 t51 t12 t54
long t0 t13 t30 t64 t49 t31 t58 t30 t37 t75 t73 t77 t45 t64
mid t63 t75 t52 t43 t18 t6 t79 t3
long t54 t57 t60 t15 t6 t16 t22 t34 t62 t57 t58 t73
short t15 t32 t66 t74 t48 t9
mid t49 t74 t23 t39 t50 t8 t55
short t70 t52 t19 t23 t79 t36
mid t74 t73 t38 t3 t30 t48 t29 t7
mid t24 t76 t43 t44 t19 t57 t37 t52 t54
short t63 t53 t29
short t8 t72 t42 t17 t58 t78
long t60 t41 t56 t54 t57 t7 t32 t60 t68 t40 t60 t18 t3 t62
long t68 t14 t41 t79 t36 t10 t7 t54 t67 t6 t32
long t73 t57 t39 t66 t57 t7 t19 t39 t2 t73 t38
long t62 t61 t38 t3 t72 t27 t42 t5 t25 t67 t4
mid t17 t13 t21 t38 t7 t23 t10 t41 t25
short t77 t36 t4 t26 t31
short t28 t3 t16 t20 t65
long t24 t7 t32 t43 t63 t23 t16 t45 t0 t78 t19 t69 t67
mid t12 t17 t23 t1 t57 t36 t39 t31 t53
long t59 t26 t5 t21 t11 t65 t33 t50 t47 t5 t34 t21 t4 t69
long t29 t35 t44 t33 t32 t79 t19 t21 t68 t79 t33 t73
mid t75 t34 t13 t35 t0 t11 t30 t13 t3
short t4 t29 t70 t76 t27 t54
long t0 t26 t34 t21 t77 t56 t70 t0 t31 t23 t26 t8 t52 t15
long t15 t18 t68 t60 t1 t57 t41 t76 t24 t76 t61
short t41 t45 t70
long t4 t8 t28 t30 t49 t67 t45 t71 t67 t53 t77 t6 t39
short t53 t20 t29 t4 t48
short t76 t72 t4
mid t8 t35 t15 t60 t37 t50 t22 t79 t35 t40
mid t29 t74 t24 t66 t61 t19 t2 t48
short t16 t74 t13
long t29 t66 t21 t7 t77 t43 t28 t37 t14 t20 t60 t70 t52 t19
mid t4 t19 t37 t60 t44 t50 t35 t61 t51
mid t32 t7 t64 t2 t2 t56 t65 t42
long t21 t52 t61 t24 t78 t47 t48 t75 t60 t61 t17
mid t45 t70 t75 t55 t46 t42 t41 t44
long t35 t16 t48 t39 t73 t60 t60 t0 t42 t27 t7
mid t2 t58 t34 t22 t68 t29 t63 t33
mid t15 t13 t20 t38 t23 t33 t63 t31 t55
short t51 t42 t12 t33 t40 t29
mid t58 t20 t60 t39 t28 t37 t18 t38
long t5 t60 t46 t39 t65 t68 t59 t18 t25 t59 t5 t67 t32 t56 t10
mid t47 t23 t51 t72 t23 t57 t4 t46 t54
long t27 t20 t18 t22 t24 t35 t31 t7 t29 t79 t48 t5 t15 t15
long t75 t40 t50 t59 t67 t33 t47 t8 t29 t5 t28 t74 t53 t51
long t68 t59 t37 t10 t5 t78 t76 t52 t55 t9 t12
long t21 t60 t64 t3 t60 t29 t64 t53 t56 t2 t35 t36 t28
long t34 t7 t19 t60 t56 t42 t45 t13 t32 t72 t65 t2
mid t29 t35 t60 t12 t6 t50 t18 t69 t33 t39
long t38 t32 t4 t73 t56 t71 t67 t43 t74 t21 t70
long t67 t57 t74 t72 t19 t73 t6 t53 t59 t34 t44 t5 t8 t20 t78
short t52 t65 t23 t63 t56 t17
long t15 t58 t37 t72 t60 t0 t7 t76 t63 t64 t38 t35 t13 t17 t26
mid t50 t75 t6 t34 t0 t16 t72
short t52 t39 t8
long t76 t41 t46 t21 t30 t71 t28 t21 t71 t9 t19 t26 t27 t71 t70
mid t44 t49 t54 t67 t45 t33 t62
mid t69 t14 t24 t22 t1 t35 t23 t34 t10
long t28 t61 t66 t45 t6 t15 t58 t2 t79 t21 t53 t21 t0 t32
short t74 t52 t39 t26 t30
long t2 t44 t71 t22 t19 t72 t4 t36 t20 t71 t42 t20 t51 t11 t78
short t43 t19 t0 t69 t35
mid t70 t49 t29 t64 t52 t34 t49 t67
short t45 t43 t13
long t33 t48 t35 t56 t53 t32 t17 t18 t15 t79 t59 t2
long t41 t60 t37 t50 t31 t37 t5 t61 t50 t5 t74
short t73 t42 t41 t15 t39 t0
long t66 t36 t3 t79 t30 t22 t51 t49 t37 t44 t5 t29 t38 t16 t13
mid t26 t18 t33 t69 t62 t32 t72 t18 t28
mid t61 t62 t39 t49 t2 t41 t16 t11 t7 t44
mid t15 t22 t15 t42 t59 t56 t10 t6 t8
short t75 t22 t23 t14
mid t67 t63 t35 t41 t59 t56 t7 t2 t25
short t10 t59 t77
long t77 t46 t52 t6 t9 t21 t54 t22 t74 t78 t31
long t72 t23 t17 t45 t6 t78 t53 t58 t61 t20 t79
mid t23 t43 t8 t67 t26 t43 t21 t20
mid t77 t22 t10 t28 t48 t51 t21
short t46 t42 t69 t16 t73 t4
mid t25 t8 t78 t52 t14 t25 t73
mid t33 t20 t35 t35 t65 t25 t72 t42 t41 t51
long t21 t25 t23 t34 t76 t30 t1 t64 t17 t32 t59 t72 t55
short t62 t71 t27 t7 t65 t17
short t4 t63 t72 t60 t64
long t61 t18 t1 t23 t67 t30 t57 t11 t42 t44 t17 t20 t22 t25
long t57 t1 t30 t5 t46 t18 t39 t60 t41 t32 t6 t15
short t38 t52 t10 t1 t4
long t31 t32 t34 t53 t78 t77 t49 t57 t74 t35 t62 t12 t66
long t26 t76 t26 t62 t7 t17 t12 t11 t25 t34 t10 t54 t27 t16
mid t6 t8 t50 t20 t43 t24 t22 t0 t52 t47
mid t65 t52 t7 t3 t54 t47 t45 t71 t33 t28
long t19 t42 t9 t37 t55 t26 t74 t79 t61 t58 t5 t76 t1 t45 t47
short t62 t57 t70 t53
mid t8 t51 t34 t31 t39 t67 t48 t36
mid t68 t35 t19 t58 t64 t7 t0 t68 t58
mid t70 t9 t56 t25 t72 t72 t48 t28 t63
short t61 t38 t36 t66
long t24 t77 t59 t11 t25 t47 t73 t73 t19 t20 t36
long t30 t66 t43 t71 t31 t68 t8 t20 t66 t52 t51 t75 t56 t41 t69
long t77 t74 t72 t49 t64 t63 t62 t75 t34 t8 t57
short t31 t56 t42 t33
mid t54 t35 t40 t34 t74 t51 t59
long t18 t23 t19 t7 t66 t5 t14 t51 t20 t17 t21 t51 t74
long t13 t63 t30 t5 t78 t1 t23 t68 t55 t59 t34 t58 t58
short t67 t69 t73 t43 t25
short t67 t32 t78 t4
long t36 t18 t34 t10 t43 t3 t1 t24 t70 t75 t22 t35 t44 t63
long t31 t36 t8 t79 t10 t40 t79 t52 t45 t68 t61 t25 t73 t50
long t6 t28 t42 t59 t13 t44 t0 t10 t62 t39 t27 t54
mid t65 t20 t6 t59 t41 t28 t14 t40 t48
long t15 t53 t40 t46 t18 t18 t73 t63 t50 t25 t66 t40 t40
mid t5 t0 t16 t17 t23 t17 t31 t49
short t73 t42 t68 t23 t29
short t74 t44 t76
short t66 t28 t58 t64 t42 t59
long t73 t56 t51 t66 t75 t43 t77 t11 t70 t20 t64 t4 t40
long t26 t48 t10 t56 t37 t21 t25 t69 t33 t29 t68
mid t27 t55 t7 t15 t1 t75 t23 t60
short t9 t5 t21 t32
long t68 t30 t67 t23 t9 t73 t3 t49 t6 t77 t38 t54 t17 t54
mid t7 t2 t30 t34 t15 t2 t17 t42
long t79 t32 t1 t31 t71 t64 t67 t75 t51 t23 t23
long t5 t30 t44 t12 t70 t59 t48 t54 t42 t50 t52 t67 t10 t26
short t50 t61 t24 t7
mid t14 t72 t55 t61 t70 t57 t60 t8 t46
short t50 t11 t34 t64 t3
long t60 t42 t18 t12 t61 t35 t57 t55 t75 t33 t52 t20
long t47 t62 t38 t2 t41 t31 t37 t68 t45 t56 t23
long t36 t3 t3 t31 t54 t27 t28 t78 t15 t31 t19
short t14 t68 t62 t17 t71
short t59 t27 t17
short t74 t49 t23 t73 t5 t77
long t26 t24 t20 t53 t68 t42 t77 t73 t49 t49 t2
long t57 t42 t70 t37 t73 t63 t6 t47 t28 t15 t62
mid t36 t74 t55 t62 t50 t22 t54 t1
mid t67 t27 t52 t18 t37 t17 t71 t53 t69 t3
long t14 t30 t60 t57 t21 t58 t12 t26 t9 t46 t27
mid t22 t10 t9 t0 t21 t72 t52 t54 t54
short t48 t74 t39 t18 t71
short t10 t45 t68 t17 t59
mid t25 t23 t11 t21 t17 t54 t29 t59
short t76 t37 t48 t70
short t13 t79 t16
mid t72 t17 t4 t5 t45 t1 t53 t6
short t59 t35 t9 t24 t43
short t15 t18 t59 t74 t33
short t24 t57 t15 t18
long t35 t21 t74 t12 t14 t43 t77 t23 t34 t29 t74 t3 t4 t24 t13
short t30 t28 t79 t11
mid t24 t55 t76 t4 t55 t6 t25 t11
short t50 t49 t42 t69 t1
mid t26 t17 t46 t3 t55 t2 t6 t63 t18 t25
short t11 t50 t50 t21
short t37 t57 t16 t39 t78
mid t67 t55 t10 t70 t51 t53 t5 t74
long t30 t40 t63 t70 t45 t56 t38 t76 t54 t34 t70
long t52 t13 t6 t76 t74 t8 t53 t46 t78 t39 t32 t73
long t63 t0 t7 t72 t13 t61 t11 t76 t65 t75 t25 t56 t49 t47 t23
short t71 t11 t56
short t40 t52 t56
long t54 t39 t33 t43 t73 t51 t30 t1 t66 t76 t11 t15 t56 t12
mid t12 t60 t76 t10 t57 t19 t52 t71
long t3 t79 t74 t39 t3 t44 t7 t26 t40 t29 t4 t51 t75 t33 t25
mid t57 t31 t72 t19 t28 t42 t23 t31 t76
long t14 t76 t5 t16 t8 t58 t69 t61 t20 t12 t35 t8 t20 t30
long t55 t16 t75 t15 t18 t79 t4 t4 t68 t78 t1 t67 t33
short t29 t38 t8 t32
mid t35 t63 t49 t30 t10 t34 t25 t22 t1 t44
mid t63 t70 t73 t0 t19 t36 t77 t68 t74 t32
short t8 t34 t42 t62
long t74 t41 t7 t11 t22 t57 t44 t60 t30 t42 t19
short t46 t37 t34 t31
long t73 t77 t31 t76 t72 t28 t77 t75 t60 t5 t67 t73
mid t44 t56 t58 t22 t77 t27 t39 t30 t75
mid t12 t31 t63 t45 t78 t6 t47
short t4 t31 t33 t26 t70
short t63 t14 t58 t55
mid t16 t10 t2 t34 t74 t23 t14
mid t75 t60 t29 t58 t57 t62 t72 t78
short t17 t75 t57 t10 t20
mid t60 t2 t2 t27 t52 t38 t16 t76 t8
mid t66 t44 t76 t8 t9 t41 t57
long t7 t32 t49 t28 t16 t5 t3 t71 t0 t57 t50 t79 t41 t51 t21
long t74 t51 t74 t25 t44 t68 t75 t79 t10 t28 t66 t75 t64 t43
mid t0 t14 t45 t25 t7 t2 t42 t67
long t30 t69 t65 t64 t1 t60 t5 t37 t35 t67 t45 t47 t57 t26 t66
mid t11 t29 t39 t73 t3 t20 t49 t50 t17 t42
mid t24 t79 t30 t39 t56 t58 t59 t43 t9 t25
long t52 t38 t53 t45 t59 t33 t35 t38 t17 t58 t43 t30 t50
mid t70 t64 t57 t45 t45 t17 t77
short t23 t57 t76
mid t60 t48 t8 t3 t69 t46 t5
mid t78 t22 t31 t60 t72 t67 t26
short t48 t40 t72 t49
mid t40 t3 t64 t36 t22 t24 t76 t47
long t49 t25 t68 t16 t47 t50 t75 t53 t44 t71 t50
long t23 t4 t55 t4 t30 t37 t50 t19 t42 t39 t43 t37 t50
long t61 t7 t71 t46 t61 t8 t75 t20 t61 t61 t63 t2 t73 t64 t19
long t50 t3 t64 t46 t46 t41 t25 t72 t31 t16 t38 t56 t53 t79
short t39 t42 t3 t17 t41 t32
long t73 t22 t17 t0 t53 t74 t70 t40 t33 t73 t42
mid t16 t49 t14 t24 t72 t43 t16 t76 t26
mid t14 t68 t32 t20 t25 t26 t18 t11 t43 t47
long t3 t65 t35 t10 t20 t79 t1 t71 t1 t15 t64 t71 t22 t63
short t68 t65 t12 t20
mid t33 t30 t78 t2 t48 t56 t12 t66 t32
short t43 t73 t79 t17 t19 t15
long t16 t66 t1 t7 t9 t26 t14 t52 t75 t4 t58
short t54 t5 t17
mid t27 t74 t17 t6 t13 t53 t9
mid t69 t49 t73 t55 t15 t42 t26
mid t0 t28 t58 t26 t49 t37 t5 t65 t18
short t78 t40 t3 t35 t4 t51
mid t51 t9 t27 t9 t61 t39 t59 t78 t20
long t32 t68 t36 t58 t49 t57 t57 t65 t14 t33 t67 t33
mid t50 t11 t11 t56 t7 t63 t16 t78
short t64 t27 t51
mid t9 t52 t58 t63 t15 t42 t38 t18 t24
mid t2 t24 t69 t23 t62 t46 t79
short t67 t8 t3 t78
mid t74 t5 t6 t15 t38 t51 t41 t11 t77
long t14 t4 t67 t58 t72 t76 t40 t66 t72 t9 t68
short t2 t32 t29 t34 t10
short t16 t58 t64 t22 t42
short t32 t36 t15 t10
mid t34 t43 t58 t75 t47 t27 t18 t28
mid t36 t36 t17 t68 t59 t54 t5
mid t69 t48 t26 t57 t50 t9 t77
short t62 t73 t35
mid t14 t42 t69 t72 t69 t49 t42
short t32 t8 t12 t52 t3 t64
long t33 t9 t71 t65 t12 t48 t57 t50 t28 t9 t52 t32 t68
mid t64 t12 t21 t79 t19 t4 t71 t2 t12 t39
mid t49 t75 t71 t4 t26 t22 t71 t40 t31 t68
long t62 t38 t71 t13 t5 t29 t4 t23 t68 t51 t48 t21 t43
long t6 t63 t48 t28 t62 t12 t59 t4 t31 t35 t24 t7 t67 t61
short t24 t79 t9 t24 t7
long t50 t15 t36 t44 t45 t62 t53 t35 t39 t19 t27
short t12 t20 t4 t75
mid t34 t22 t31 t78 t43 t1 t67 t25 t22 t53
long t12 t65 t15 t67 t48 t48 t23 t62 t4 t20 t5 t8 t78 t36 t74
long t66 t16 t78 t42 t67 t21 t73 t0 t63 t19 t62 t6 t8 t75 t24
short t66 t48 t46
long t68 t0 t65 t57 t63 t73 t55 t7 t11 t72 t48 t64
short t15 t43 t29 t3 t12
long t41 t8 t26 t10 t35 t66 t38 t1 t20 t62 t28 t64 t29
mid t61 t67 t11 t28 t57 t14 t53 t45
mid t22 t61 t34 t29 t18 t24 t35 t35 t51
mid t73 t65 t10 t23 t68 t17 t6 t0 t63
long t64 t69 t46 t73 t59 t72 t30 t7 t57 t41 t50 t1 t78
long t59 t65 t13 t48 t21 t14 t33 t54 t79 t44 t7 t70 t34
long t32 t0 t38 t66 t21 t38 t34 t51 t28 t64 t8 t5 t33
long t24 t9 t55 t12 t46 t29 t76 t38 t10 t44 t36 t55 t61
short t43 t48 t35 t67
short t62 t58 t45 t34 t11
long t32 t76 t79 t12 t22 t12 t68 t79 t4 t42 t56
short t39 t17 t27 t28 t27 t59
long t37 t27 t12 t2 t31 t14 t33 t52 t74 t26 t24 t46
mid t17 t23 t9 t46 t46 t3 t70 t48
mid t20 t8 t23 t66 t39 t2 t8 t64 t47
short t73 t46 t28 t0 t28
mid t33 t14 t43 t3 t46 t75 t32 t52 t9
long t61 t69 t65 t17 t44 t75 t13 t77 t29 t24 t37 t45 t67 t23 t78
mid t23 t75 t51 t58 t77 t70 t2 t10
long t53 t65 t17 t55 t9 t17 t34 t48 t50 t78 t18 t73 t39
short t54 t7 t52 t31 t34 t67
long t21 t62 t73 t78 t3 t26 t32 t4 t63 t55 t39 t45
long t29 t14 t12 t12 t2 t23 t70 t45 t31 t58 t30 t56 t42
short t55 t73 t66 t69 t39
long t22 t35 t38 t6 t39 t38 t37 t77 t8 t72 t12 t51 t44 t32
mid t69 t28 t8 t18 t47 t64 t22 t4 t68 t6
mid t52 t16 t42 t39 t15 t15 t68 t51 t29 t42
long t78 t56 t25 t30 t23 t46 t49 t37 t75 t43 t49 t6 t79 t65
short t77 t46 t0 t35 t6
mid t64 t65 t8 t40 t46 t32 t9 t28 t51 t41
mid t13 t37 t5 t76 t9 t59 t18
long t33 t45 t33 t35 t37 t55 t40 t77 t20 t7 t31 t5 t42
short t14 t72 t64 t8 t11 t9
mid t48 t52 t69 t51 t11 t40 t42 t76 t6 t17
long t25 t36 t69 t8 t20 t50 t18 t71 t77 t73 t55 t2 t10 t6 t10
short t22 t9 t10 t55
mid t53 t70 t53 t4 t49 t21 t69 t38 t38 t42
short t39 t17 t61 t71
long t27 t41 t59 t9 t6 t27 t73 t53 t17 t12 t53 t15 t69 t35 t50
long t2 t62 t31 t14 t77 t10 t15 t28 t28 t53 t0 t64 t40 t3
mid t75 t18 t77 t46 t30 t2 t39
mid t76 t18 t40 t4 t2 t33 t48 t1 t10 t69
long t34 t49 t2 t32 t54 t73 t4 t75 t50 t50 t45
long t78 t0 t5 t50 t72 t5 t55 t35 t3 t33 t42 t77
mid t12 t21 t2 t75 t58 t9 t76 t52 t77
long t46 t36 t76 t0 t42 t42 t32 t71 t36 t44 t29 t39 t18 t29 t0
mid t39 t5 t54 t75 t78 t6 t75 t18
long t45 t68 t21 t1 t30 t38 t28 t37 t50 t3 t7 t6 t2 t55 t13
short t23 t6 t11
long t51 t44 t62 t39 t18 t24 t41 t20 t54 t63 t29 t29
mid t77 t55 t20 t67 t75 t73 t38
long t48 t49 t48 t12 t77 t40 t8 t64 t9 t54 t9 t13 t56
long t47 t55 t26 t74 t73 t44 t6 t46 t58 t7 t64 t20 t41 t48 t77
mid t5 t48 t58 t10 t26 t32 t38 t77 t8 t78
long t53 t72 t79 t13 t31 t39 t28 t66 t35 t61 t62 t75 t55 t27
short t19 t12 t74 t10
long t43 t35 t63 t69 t21 t15 t14 t71 t40 t2 t34
long t37 t73 t62 t29 t46 t31 t19 t22 t62 t54 t4 t24 t67
mid t53 t4 t75 t62 t37 t39 t71 t30 t42 t8
mid t34 t26 t19 t58 t44 t73 t2
short t0 t54 t75
long t42 t58 t8 t44 t47 t67 t70 t12 t53 t72 t42 t50 t0
short t4 t77 t9
short t46 t13 t74 t34
long t12 t4 t35 t22 t28 t32 t35 t36 t31 t5 t55 t50 t71 t54 t23
long t0 t11 t29 t26 t52 t66 t52 t31 t75 t70 t56
short t12 t30 t53
long t70 t46 t45 t5 t77 t39 t47 t50 t74 t56 t44 t74 t18
long t22 t46 t8 t79 t13 t71 t62 t0 t48 t4 t28 t37
short t45 t56 t30
long t17 t77 t32 t44 t62 t51 t10 t12 t48 t40 t3 t1 t76 t37 t62
short t23 t61 t45
short t3 t16 t52 t28 t29 t57
long t0 t8 t75 t24 t23 t58 t49 t31 t0 t63 t79 t41 t27 t13 t69
long t71 t16 t65 t47 t27 t16 t50 t50 t67 t33 t16
long t6 t14 t60 t6 t14 t10 t40 t32 t27 t58 t64 t46 t32 t29 t76
mid t12 t26 t46 t17 t53 t15 t27
long t68 t39 t70 t27 t54 t3 t75 t55 t2 t72 t13 t67
long t21 t65 t79 t24 t41 t67 t33 t6 t4 t0 t7 t52 t78 t66
mid t45 t14 t25 t30 t37 t79 t12 t16 t22
short t41 t2 t60
mid t7 t62 t74 t25 t1 t14 t4 t29
mid t25 t23 t31 t37 t17 t43 t26
short t14 t11 t49 t36
long t53 t48 t53 t15 t9 t4 t42 t53 t26 t21 t64
long t43 t57 t0 t36 t24 t43 t39 t36 t24 t31 t24 t4 t74
mid t54 t26 t7 t71 t40 t59 t56 t53 t16 t9
mid t71 t39 t61 t47 t56 t46 t24
mid t8 t68 t63 t24 t22 t79 t23 t56
mid t10 t2 t27 t8 t24 t23 t23 t19
long t49 t18 t76 t8 t79 t60 t44 t54 t79 t8 t0 t50 t56
mid t59 t50 t16 t19 t68 t63 t30
long t32 t46 t15 t36 t38 t61 t35 t30 t76 t58 t21 t8 t52 t62 t35
long t26 t36 t32 t22 t35 t45 t76 t17 t28 t55 t5 t10 t55
mid t13 t37 t66 t5 t40 t21 t49 t55 t53 t61
long t64 t27 t34 t61 t8 t4 t12 t41 t37 t31 t52
mid t12 t54 t72 t79 t28 t30 t44 t50 t25
long t44 t18 t58 t57 t5 t32 t15 t60 t74 t27 t0 t29 t30
short t46 t34 t22 t1 t30 t4
mid t65 t32 t56 t76 t47 t43 t53 t50
short t65 t61 t4 t24 t36
mid t32 t17 t28 t1 t42 t12 t59 t61
long t11 t25 t52 t3 t66 t47 t29 t50 t64 t37 t23 t26 t36 t33
long t13 t24 t63 t41 t52 t43 t47 t77 t24 t29 t50
short t72 t63 t39
long t43 t6 t32 t41 t68 t11 t9 t76 t5 t48 t41 t29 t22
long t37 t50 t2 t20 t20 t39 t11 t18 t60 t76 t25
long t60 t61 t53 t20 t3 t53 t30 t39 t14 t61 t70 t20 t73 t76
short t6 t45 t46 t53 t48 t21
long t9 t47 t22 t72 t61 t71 t73 t72 t19 t26 t79 t20 t15 t9
short t44 t57 t13 t44 t78 t7
short t15 t26 t2
long t1 t77 t6 t15 t64 t51 t36 t71 t48 t50 t43 t21
long t20 t33 t69 t14 t3 t38 t78 t66 t17 t28 t59 t3 t39 t38 t45
long t13 t77 t24 t29 t11 t37 t60 t21 t22 t27 t70 t40 t51 t15
long t62 t56 t34 t14 t60 t7 t32 t61 t57 t36 t48
long t32 t44 t38 t8 t73 t47 t52 t31 t73 t61 t15
long t16 t35 t27 t60 t15 t32 t40 t10 t43 t38 t47 t41
short t49 t1 t74 t35 t15 t17
short t56 t37 t73
short t17 t65 t26 t44 t3
short t66 t36 t39 t32 t73 t35
long t0 t27 t10 t38 t66 t17 t4 t3 t4 t39 t62
short t25 t22 t8 t73 t29 t75
mid t55 t6 t56 t32 t79 t18 t19
mid t39 t32 t60 t43 t17 t3 t63 t43
mid t52 t54 t5 t76 t39 t16 t68 t1 t0 t5
mid t58 t18 t76 t20 t77 t18 t27
short t65 t32 t78 t74
short t19 t70 t60 t51 t17
short t4 t70 t73 t78 t3 t23
long t21 t54 t46 t33 t8 t20 t77 t47 t79 t57 t47 t43 t50 t11 t38
long t47 t15 t22 t49 t40 t32 t67 t59 t73 t36 t44 t40
long t54 t46 t7 t35 t7 t4 t37 t8 t61 t31 t21
short t12 t47 t31
long t67 t68 t65 t54 t70 t38 t0 t75 t3 t35 t8 t72
mid t26 t18 t23 t23 t24 t27 t24 t72 t13 t11
long t60 t50 t27 t38 t6 t74 t18 t67 t69 t66 t69
mid t7 t77 t46 t43 t1 t50 t77
long t9 t23 t30 t60 t3 t27 t58 t18 t2 t49 t47 t17 t31
long t73 t73 t19 t7 t54 t76 t45 t53 t76 t37 t26 t16 t21 t77
long t66 t30 t38 t73 t58 t47 t27 t69 t1 t63 t15 t5 t25 t62 t18
mid t38 t3 t71 t12 t61 t75 t5 t18
long t8 t62 t69 t1 t62 t37 t73 t78 t15 t75 t9 t1
short t55 t2 t66 t18
short t57 t72 t55 t32
long t75 t11 t37 t77 t79 t44 t71 t2 t60 t62 t30 t71 t30 t78 t31
short t29 t8 t23 t7 t13 t30
short t76 t47 t33 t67 t38 t77
long t68 t1 t18 t24 t12 t0 t17 t49 t37 t23 t71 t20
mid t59 t1 t72 t18 t24 t17 t5
long t16 t72 t30 t71 t64 t0 t12 t51 t74 t26 t9
long t0 t13 t62 t41 t73 t48 t22 t51 t30 t28 t9 t18 t33
long t0 t32 t21 t0 t5 t0 t74 t34 t74 t4 t54 t15 t31 t4
long t46 t54 t46 t36 t40 t17 t27 t26 t38 t66 t18 t32 t8 t28 t54
mid t20 t27 t55 t43 t5 t12 t41 t62 t53 t20
short t6 t73 t18 t5
long t76 t66 t68 t34 t75 t25 t50 t39 t19 t17 t27 t40 t28 t6
long t17 t1 t33 t58 t69 t11 t53 t56 t9 t29 t19 t19
long t47 t78 t73 t1 t76 t52 t62 t68 t77 t30 t31 t52 t62 t9 t41
mid t72 t54 t38 t44 t63 t67 t27 t15
long t76 t42 t71 t55 t51 t69 t21 t26 t62 t43 t78 t51
long t15 t46 t73 t75 t29 t21 t47 t63 t23 t78 t3
long t25 t8 t58 t35 t2 t55 t46 t9 t19 t46 t34 t15
long t10 t77 t57 t72 t69 t1 t62 t71 t76 t18 t54 t63 t67
long t43 t46 t13 t4 t39 t2 t64 t67 t12 t16 t34 t70 t24
short t19 t69 t46 t40 t64
short t2 t65 t53 t70
short t27 t62 t60 t1
long t24 t12 t12 t58 t37 t48 t14 t66 t49 t23 t41 t37 t20 t2 t39
short t74 t39 t73 t25
short t55 t75 t64 t20 t68
short t29 t21 t41 t33
long t20 t59 t73 t63 t22 t32 t36 t79 t5 t20 t71 t37 t62 t7
short t32 t73 t35 t43
short t64 t74 t9 t14 t9
long t68 t10 t48 t59 t16 t73 t61 t1 t4 t24 t10 t30 t51 t79
mid t72 t37 t20 t9 t64 t57 t31 t11
long t31 t67 t57 t32 t18 t26 t59 t52 t0 t61 t24
mid t58 t32 t58 t65 t69 t39 t46 t33
long t74 t36 t65 t12 t18 t71 t75 t30 t32 t70 t29 t35
mid t56 t51 t73 t68 t11 t9 t72 t35 t34 t63
short t38 t40 t65
short t48 t69 t65 t6 t55 t16
mid t38 t51 t45 t24 t3 t21 t59
short t65 t49 t3 t75
mid t48 t77 t47 t19 t77 t32 t43
long t12 t22 t37 t52 t12 t60 t50 t4 t67 t31 t19 t17
mid t55 t44 t24 t59 t34 t66 t54
long t16 t57 t15 t18 t17 t22 t31 t74 t70 t60 t28 t24 t59
short t46 t7 t24 t19 t47 t54
short t29 t34 t56 t53 t70
long t78 t40 t45 t59 t48 t44 t26 t47 t44 t18 t40 t68 t43
mid t50 t13 t50 t30 t69 t42 t74 t16 t45
long t52 t49 t73 t22 t26 t27 t50 t70 t68 t73 t42 t54 t37 t78 t5
long t51 t64 t14 t71 t36 t68 t2 t59 t61 t3 t71 t11 t29 t62 t17
long t52 t42 t4 t2 t11 t50 t79 t62 t7 t7 t23
mid t6 t71 t66 t23 t58 t60 t43 t39 t56
long t9 t16 t37 t29 t79 t73 t26 t71 t77 t65 t40 t15
mid t39 t75 t44 t28 t66 t50 t57
long t19 t76 t54 t63 t6 t9 t24 t54 t74 t48 t51 t69 t26
long t18 t29 t71 t74 t12 t28 t11 t72 t43 t75 t38 t46
mid t2 t22 t7 t71 t68 t13 t50 t73 t36
long t40 t52 t47 t30 t64 t4 t59 t66 t53 t35 t70 t77 t42 t19 t56
mid t9 t23 t34 t79 t18 t20 t10
mid t22 t72 t68 t4 t31 t58 t9 t2
mid t52 t79 t1 t8 t54 t48 t35 t28
short t34 t79 t8 t38
short t78 t72 t31 t56 t7 t38
short t28 t3 t35 t45
mid t64 t41 t72 t8 t78 t45 t7 t4 t76 t53
mid t49 t50 t43 t49 t56 t22 t77 t75
long t1 t25 t33 t40 t62 t24 t78 t24 t9 t51 t27
mid t79 t44 t45 t33 t14 t48 t79
short t63 t26 t28 t54 t5 t55
short t20 t63 t78 t38 t63 t30
long t58 t58 t51 t51 t8 t57 t24 t29 t66 t2 t53 t16 t20 t78
short t24 t22 t33 t5 t11 t11
long t76 t76 t43 t24 t1 t73 t20 t12 t27 t3 t23 t60 t69
long t41 t58 t35 t8 t24 t33 t71 t69 t47 t76 t28 t49
long t29 t51 t36 t60 t56 t16 t75 t63 t36 t22 t48 t62 t68 t75 t6
long t5 t15 t18 t6 t50 t19 t38 t42 t13 t20 t52 t76 t42 t56 t38
long t41 t5 t76 t73 t30 t19 t69 t78 t66 t16 t39
short t77 t65 t66
short t63 t11 t32 t50 t11
long t46 t4 t17 t46 t36 t68 t73 t41 t60 t12 t23 t56 t5 t35 t41
short t60 t66 t20
long t44 t3 t20 t48 t63 t25 t4 t6 t63 t4 t33 t32
short t75 t71 t44 t67 t50 t26
mid t8 t18 t58 t31 t34 t45 t75
short t40 t29 t60 t9 t61 t36
short t14 t6 t11 t40 t2 t76
long t23 t79 t79 t41 t2 t26 t74 t48 t14 t56 t29 t40 t74 t17
long t55 t2 t38 t70 t0 t31 t53 t54 t22 t11 t12
long t78 t52 t54 t2 t1 t59 t74 t29 t6 t70 t20 t5 t5
short t34 t13 t63 t63 t65 t55
short t35 t73 t18
short t42 t67 t33
short t7 t77 t31
mid t14 t69 t69 t59 t42 t29 t1 t71 t55
short t72 t8 t49
mid t4 t70 t59 t42 t70 t11 t3 t57 t18 t19
mid t53 t22 t14 t57 t67 t35 t32 t46 t35
long t63 t33 t31 t8 t60 t26 t29 t31 t1 t63 t0 t19 t51
mid t22 t26 t69 t14 t79 t42 t21
mid t42 t48 t35 t31 t29 t18 t3 t30 t37 t45
mid t54 t62 t52 t0 t35 t18 t46 t18 t6
short t58 t5 t6
short t29 t77 t26 t64 t57 t52
mid t64 t16 t69 t60 t62 t75 t44
mid t3 t33 t45 t37 t18 t70 t42
short t69 t31 t78 t49 t49
short t54 t40 t58 t79 t67
long t73 t42 t47 t60 t57 t18 t3 t67 t44 t20 t78
mid t7 t40 t33 t49 t9 t29 t26 t28
short t57 t71 t50
mid t58 t27 t21 t38 t24 t38 t65 t0 t76 t46
mid t7 t56 t32 t3 t35 t25 t70 t1
mid t53 t42 t2 t22 t21 t2 t79 t0 t3 t62
short t79 t59 t66 t6 t20 t44
short t1 t17 t45 t38 t63
long t66 t15 t46 t73 t35 t41 t17 t16 t30 t5 t37 t23 t17 t6 t24
long t3 t8 t13 t1 t13 t16 t65 t68 t24 t31 t62 t75 t40 t22 t46
mid t66 t29 t10 t21 t20 t65 t3 t59 t62 t5
long t75 t41 t11 t38 t50 t45 t20 t43 t44 t32 t32 t50 t47 t64
long t20 t45 t47 t46 t76 t32 t57 t40 t11 t26 t7
long t46 t11 t4 t72 t17 t1 t53 t37 t8 t18 t15 t58 t66 t67
long t6 t11 t56 t24 t79 t62 t30 t9 t10 t16 t76 t23
short t75 t58 t73 t27 t41
mid t29 t62 t42 t54 t57 t37 t66 t74 t4
short t56 t66 t30
mid t21 t47 t71 t4 t8 t63 t62 t44
mid t25 t40 t18 t78 t23 t29 t1 t9 t24
short t28 t9 t7 t11 t60
short t38 t44 t1
short t32 t4 t38 t15
long t51 t72 t34 t75 t30 t45 t71 t4 t62 t37 t5 t65 t39 t29 t62
long t58 t67 t3 t20 t49 t17 t3 t24 t68 t69 t20 t11 t1
short t39 t34 t66 t36 t56 t21
mid t78 t17 t66 t19 t57 t4 t1 t46 t1
short t10 t14 t0
short t27 t33 t55 t74 t57
short t67 t14 t61 t22 t1 t43
mid t33 t12 t38 t57 t28 t71 t70 t50 t33 t14
long t28 t73 t8 t46 t50 t40 t9 t25 t56 t61 t37 t67
mid t23 t73 t12 t64 t30 t48 t24 t32
long t0 t14 t24 t6 t11 t60 t61 t17 t42 t7 t55 t76 t34 t39 t79
mid t28 t74 t43 t67 t38 t29 t40 t49 t27
long t4 t9 t3 t69 t50 t72 t60 t44 t62 t8 t7 t65 t79 t21
mid t78 t41 t71 t26 t4 t64 t67 t66 t38
long t29 t75 t43 t62 t71 t44 t17 t18 t39 t51 t37 t36 t56 t49 t50
long t51 t32 t71 t43 t26 t16 t53 t59 t69 t36 t16 t39 t39 t60
short t77 t26 t57 t17
short t78 t44 t22 t53
mid t5 t71 t77 t48 t27 t30 t39 t29 t12
short t26 t40 t36
short t11 t0 t48 t74
long t66 t31 t35 t46 t29 t76 t68 t28 t54 t36 t43 t28
long t25 t60 t30 t76 t72 t29 t29 t12 t30 t27 t6 t11 t23
long t11 t31 t67 t56 t9 t44 t48 t72 t47 t49 t78 t20
long t41 t3 t74 t69 t79 t24 t66 t13 t66 t77 t5 t26 t41
long t35 t39 t4 t25 t34 t74 t66 t52 t38 t65 t34
short t54 t28 t19 t39 t53 t55
short t43 t69 t14
long t50 t8 t21 t28 t34 t39 t45 t53 t2 t50 t33
mid t56 t3 t51 t51 t76 t18 t37 t71 t43 t2
long t31 t68 t68 t57 t60 t50 t2 t28 t1 t24 t75
short t77 t57 t73
long t66 t2 t5 t40 t33 t25 t68 t70 t12 t35 t55 t14
short t76 t66 t6 t58 t77
mid t2 t9 t48 t79 t57 t65 t14 t21 t77
short t74 t12 t57 t55
short t49 t38 t79 t6
short t7 t40 t61 t14
mid t4 t69 t50 t51 t63 t24 t35
short t52 t10 t69 t47
long t45 t54 t26 t51 t63 t35 t25 t61 t26 t9 t17 t18 t17 t57
long t74 t23 t59 t2 t45 t61 t25 t79 t53 t47 t34 t14 t24 t67 t70
long t65 t26 t58 t28 t11 t21 t22 t55 t18 t12 t42
long t63 t15 t0 t16 t73 t32 t58 t15 t36 t52 t4
mid t50 t74 t21 t50 t53 t35 t67 t34 t46
mid t72 t49 t52 t29 t43 t45 t18 t77
mid t75 t73 t36 t46 t22 t44 t16 t11
long t19 t57 t20 t16 t47 t11 t37 t72 t35 t59 t56 t66 t77 t8
short t50 t25 t33
long t75 t29 t67 t59 t58 t49 t15 t51 t74 t58 t33 t57 t14 t9
long t53 t20 t44 t69 t52 t11 t51 t59 t73 t33 t60 t9 t35 t8 t53
short t66 t8 t8 t19 t32
mid t54 t61 t28 t43 t43 t68 t73 t57
long t51 t10 t45 t16 t1 t7 t76 t20 t55 t62 t54 t56
long t66 t13 t71 t45 t33 t77 t54 t58 t1 t53 t7 t0 t79 t25 t67
long t73 t13 t9 t77 t16 t59 t21 t48 t9 t49 t29
short t43 t71 t44 t12 t34 t73
short t57 t62 t78
short t24 t71 t4 t34 t64 t32
short t75 t70 t20
mid t21 t41 t20 t43 t10 t78 t62
short t25 t60 t59 t21 t10
mid t1 t8 t61 t49 t52 t75 t23 t24
mid t31 t43 t20 t7 t54 t44 t38
long t2 t0 t28 t28 t2 t45 t1 t39 t77 t13 t14
mid t16 t2 t37 t35 t7 t46 t18 t22 t67 t19
short t26 t56 t70 t53 t39 t28
long t65 t40 t47 t7 t25 t30 t38 t76 t55 t43 t50 t4
long t32 t14 t0 t77 t56 t22 t34 t23 t58 t20 t43 t7 t3 t61
short t46 t41 t66 t64 t51
long t58 t76 t38 t39 t29 t66 t56 t10 t45 t0 t69
long t10 t44 t49 t62 t11 t37 t52 t79 t5 t13 t38
short t21 t61 t30 t15
mid t48 t39 t28 t25 t16 t56 t57 t27
mid t68 t60 t74 t64 t34 t30 t65 t32
long t79 t37 t45 t14 t57 t45 t59 t9 t64 t26 t24 t9 t66
mid t44 t57 t2 t49 t3 t71 t0
short t28 t18 t25
mid t53 t40 t22 t0 t75 t78 t54 t64 t16
mid t31 t65 t21 t33 t70 t14 t23 t14 t57 t55
mid t27 t9 t58 t73 t77 t1 t4 t46 t14 t6
short t34 t50 t48
mid t16 t70 t66 t9 t54 t22 t5
long t13 t58 t75 t27 t59 t59 t18 t40 t21 t55 t68 t20 t22 t1 t26
mid t37 t54 t7 t17 t60 t25 t24 t42
short t67 t69 t6 t18 t74
short t20 t40 t71 t71 t72 t15
mid t65 t3 t77 t21 t5 t42 t42 t28 t14 t29
short t28 t40 t41 t22 t54 t77
long t76 t66 t34 t73 t69 t8 t43 t11 t2 t59 t63 t73 t56
long t69 t36 t53 t44 t46 t17 t1 t53 t7 t51 t44 t18
mid t70 t40 t14 t33 t33 t73 t77 t4 t1 t51
long t13 t6 t36 t53 t16 t58 t51 t20 t49 t29 t6 t25
mid t76 t28 t45 t48 t67 t56 t40 t6 t37 t72
mid t63 t40 t28 t56 t32 t55 t29 t38 t44 t2
mid t37 t57 t62 t65 t39 t28 t17
short t76 t36 t74 t34 t25 t6
long t76 t71 t71 t49 t12 t16 t38 t34 t69 t48 t7 t45
mid t43 t72 t44 t7 t40 t48 t57
long t25 t7 t31 t27 t37 t39 t1 t65 t21 t41 t76 t47 t48
mid t18 t61 t74 t14 t14 t65 t76 t15
mid t28 t2 t17 t59 t52 t1 t60 t33 t30
mid t74 t68 t52 t11 t63 t58 t24 t38
mid t45 t12 t46 t51 t10 t34 t29
short t70 t66 t52 t39
short t33 t29 t10 t76
short t20 t50 t12 t56
mid t79 t52 t43 t1 t75 t2 t62
mid t65 t65 t20 t60 t58 t62 t22 t41 t48
mid t32 t17 t76 t76 t75 t45 t37 t56 t9
short t10 t0 t2 t19
short t48 t12 t56 t11 t69 t13
short t23 t46 t78 t35 t27 t64
mid t24 t31 t74 t54 t13 t29 t53
short t9 t70 t52 t58 t14 t37
long t16 t63 t24 t60 t65 t8 t11 t46 t33 t50 t47
mid t48 t62 t63 t58 t48 t59 t54
mid t15 t20 t68 t16 t5 t61 t5 t42
long t68 t29 t56 t34 t49 t51 t41 t75 t58 t20 t62
short t65 t56 t17 t59 t24
short t74 t28 t40
short t38 t40 t5 t3
long t11 t53 t30 t57 t26 t58 t67 t11 t17 t14 t34 t65
mid t77 t54 t51 t15 t38 t32 t63 t35 t52
short t3 t39 t29 t1 t40
long t47 t63 t15 t46 t26 t48 t72 t20 t28 t64 t59 t10 t52
short t77 t8 t71 t55
mid t6 t49 t64 t3 t17 t58 t46 t73
mid t11 t73 t38 t63 t60 t22 t20 t21 t4 t60
long t60 t70 t46 t68 t61 t8 t62 t50 t30 t19 t60 t6 t8 t33
mid t79 t13 t49 t27 t60 t43 t10 t39 t79
long t39 t47 t75 t13 t51 t3 t29 t5 t11 t15 t61
long t69 t72 t61 t20 t25 t79 t77 t35 t19 t31 t5 t43 t29 t42 t55
long t28 t36 t46 t26 t63 t62 t17 t76 t61 t37 t32 t24 t10 t76 t55
short t39 t79 t7 t60 t41
long t62 t49 t74 t16 t24 t70 t34 t61 t70 t12 t47 t46
long t22 t27 t71 t78 t19 t8 t39 t24 t72 t4 t31 t64 t1 t66 t65
short t36 t36 t13
short t23 t33 t11
mid t65 t1 t17 t79 t1 t7 t40 t33 t50
short t55 t66 t60 t7 t38 t4
long t74 t55 t11 t67 t22 t24 t56 t9 t68 t16 t46 t45 t70 t2 t9
long t11 t69 t77 t5 t38 t14 t58 t9 t50 t47 t79 t56 t6 t54 t70
long t55 t31 t49 t71 t31 t50 t51 t29 t39 t32 t5 t32 t54 t70
short t43 t19 t60
short t31 t71 t0 t38 t11 t3
short t23 t34 t76
mid t7 t11 t29 t56 t14 t31 t6 t47 t10 t67
long t23 t12 t44 t74 t68 t14 t5 t73 t44 t17 t59 t16 t72 t50
long t77 t8 t38 t31 t52 t15 t14 t26 t62 t31 t28 t20 t35 t75 t11
long t65 t73 t58 t51 t50 t32 t2 t77 t33 t74 t37 t41 t21 t6 t33
mid t71 t43 t7 t13 t6 t20 t46
mid t32 t59 t34 t4 t77 t67 t58
mid t23 t1 t62 t73 t73 t50 t10 t76 t60 t18
short t62 t30 t64 t71
short t28 t71 t31 t41
long t0 t61 t52 t70 t72 t53 t28 t75 t38 t45 t22 t15 t60 t3
long t60 t7 t65 t8 t12 t57 t34 t2 t10 t42 t76 t47 t55
short t7 t79 t14
mid t9 t78 t66 t39 t22 t5 t66 t66 t28
long t39 t52 t53 t40 t40 t52 t22 t68 t58 t14 t39 t61 t73
mid t37 t77 t23 t12 t73 t3 t73 t28
long t59 t39 t41 t60 t25 t27 t40 t4 t58 t61 t18 t56 t16 t16
short t75 t45 t71 t37
short t36 t52 t20 t66 t75 t35
mid t74 t22 t69 t17 t48 t11 t12
short t44 t10 t74 t9
short t60 t17 t63 t20 t40
long t66 t56 t13 t64 t14 t65 t1 t31 t68 t25 t70 t59 t1 t67
short t43 t29 t63 t46 t25 t31
long t67 t72 t52 t15 t50 t25 t78 t18 t37 t54 t33 t76 t11 t63
mid t67 t41 t3 t66 t68 t68 t4 t4
long t28 t76 t62 t79 t69 t45 t27 t44 t73 t67 t8 t10 t6 t35
short t55 t26 t17 t50 t75
long t78 t60 t22 t15 t74 t67 t74 t43 t72 t36 t50
short t41 t48 t10 t46 t12 t72
mid t40 t78 t48 t55 t37 t11 t74
long t15 t58 t77 t47 t45 t75 t29 t12 t53 t41 t0 t19 t76 t41
long t19 t43 t47 t5 t36 t47 t70 t7 t58 t27 t19 t55
mid t52 t56 t22 t52 t50 t36 t35 t21 t28 t64
mid t69 t6 t54 t66 t9 t15 t2 t76 t76 t77
mid t32 t58 t6 t53 t38 t13 t34
mid t59 t1 t69 t47 t44 t22 t44 t65 t61
short t71 t68 t60 t36 t42
long t47 t48 t15 t17 t57 t54 t49 t32 t43 t20 t57 t9 t34 t13
mid t60 t29 t67 t20 t45 t31 t35 t61
long t73 t73 t57 t14 t17 t21 t52 t24 t35 t66 t51
mid t48 t46 t34 t39 t31 t21 t25 t71 t26 t28
long t25 t35 t48 t15 t11 t4 t54 t32 t15 t64 t23
long t63 t41 t14 t0 t22 t59 t59 t49 t64 t6 t17 t15 t1
mid t11 t55 t63 t21 t5 t62 t2 t38 t43 t74
short t66 t68 t33 t74 t38
long t66 t10 t2 t17 t78 t54 t76 t59 t57 t5 t12 t12 t7 t0 t57
mid t45 t3 t48 t54 t28 t60 t56 t75 t46
short t69 t75 t43 t60 t32 t20
mid t75 t12 t20 t11 t19 t77 t66 t23 t65
short t75 t53 t22 t7 t18 t9
mid t51 t49 t23 t26 t75 t62 t23 t29
short t57 t16 t68 t70 t23
long t30 t34 t69 t74 t55 t70 t54 t73 t3 t74 t2 t61
mid t73 t72 t4 t36 t52 t49 t31 t35
long t66 t71 t37 t6 t39 t79 t7 t78 t15 t59 t23 t34
mid t36 t63 t55 t17 t13 t7 t42 t28 t47 t24
long t38 t24 t2 t0 t24 t70 t32 t36 t43 t35 t63 t0
short t2 t41 t43 t16 t66 t24
short t37 t48 t49
short t49 t42 t46 t9
long t12 t14 t20 t53 t73 t30 t8 t54 t16 t35 t60 t20
long t28 t26 t77 t23 t75 t59 t36 t66 t63 t25 t52 t54 t70 t47
short t40 t67 t33 t59
short t13 t19 t55
mid t57 t77 t53 t58 t14 t47 t61 t61 t54
long t26 t52 t20 t65 t31 t11 t70 t46 t42 t32 t6
long t78 t29 t54 t67 t5 t14 t20 t68 t27 t25 t43 t15
long t7 t31 t79 t68 t64 t66 t22 t37 t74 t7 t15 t0 t24 t52
mid t50 t35 t68 t32 t51 t63 t31 t35 t33 t71
mid t61 t35 t35 t23 t78 t40 t73 t70
short t69 t74 t46 t5 t63
long t67 t68 t36 t19 t65 t63 t76 t30 t19 t39 t65 t52
mid t51 t43 t43 t27 t32 t39 t22 t77
short t4 t29 t33 t62 t41
mid t37 t40 t48 t72 t65 t62 t31
short t50 t76 t28 t30
mid t75 t38 t40 t74 t50 t61 t45 t46 t59 t2
long t53 t74 t79 t69 t53 t65 t39 t21 t6 t28 t60
long t28 t6 t34 t54 t34 t23 t45 t31 t0 t17 t19 t58 t39 t67
long t72 t44 t58 t12 t69 t64 t34 t69 t52 t30 t13
short t36 t0 t54 t53
long t76 t36 t75 t71 t34 t18 t36 t9 t68 t67 t40 t74 t29
mid t24 t4 t25 t56 t14 t19 t2 t67
long t65 t7 t7 t24 t66 t25 t13 t67 t42 t25 t32
long t58 t50 t55 t12 t20 t39 t75 t55 t7 t57 t18 t79 t31
short t54 t46 t32 t19 t7
mid t52 t74 t76 t39 t12 t76 t51 t46 t71
long t15 t69 t29 t51 t3 t13 t27 t14 t43 t64 t39
mid t20 t11 t4 t55 t19 t31 t77 t66 t10 t29
short t63 t7 t73 t26 t68
long t18 t31 t23 t59 t60 t79 t24 t4 t76 t31 t34 t13 t1 t69
short t76 t41 t13 t16 t57
mid t4 t20 t42 t78 t51 t18 t18 t15
mid t37 t46 t35 t62 t17 t16 t5 t14 t34
mid t15 t31 t65 t3 t9 t69 t57
long t72 t12 t44 t65 t3 t2 t66 t17 t65 t51 t60 t38 t12 t14 t49
short t30 t5 t11 t25
long t69 t69 t37 t35 t50 t76 t22 t46 t47 t70 t63 t36 t50 t9
mid t74 t43 t44 t20 t52 t38 t19 t47
mid t14 t8 t45 t20 t71 t15 t56 t33
long t23 t54 t57 t3 t70 t14 t77 t3 t73 t74 t16 t21 t14 t12
long t52 t27 t65 t49 t28 t14 t73 t3 t75 t36 t16
short t73 t71 t3 t15 t8
long t68 t42 t8 t40 t7 t5 t51 t19 t53 t60 t0
short t7 t48 t33 t73
long t12 t32 t45 t26 t50 t32 t13 t29 t79 t33 t55
short t43 t47 t74
short t19 t34 t1 t61
long t13 t45 t32 t5 t34 t11 t76 t32 t55 t76 t10 t58
long t28 t41 t75 t21 t73 t9 t29 t18 t5 t35 t49 t12 t66
mid t68 t11 t46 t13 t46 t40 t0 t10
short t66 t36 t65 t56 t16 t11
short t46 t57 t55 t5
long t55 t51 t77 t59 t39 t17 t66 t30 t52 t34 t71 t47 t9 t51
short t15 t0 t46 t50 t55 t11
short t8 t53 t20
long t73 t11 t23 t49 t69 t1 t5 t63 t73 t12 t69 t35 t67 t73 t10
mid t23 t78 t63 t58 t19 t18 t19 t1 t17
short t47 t16 t77 t57 t25 t73
mid t26 t56 t52 t12 t2 t19 t31 t62 t53 t14
long t26 t79 t3 t10 t70 t26 t22 t8 t56 t44 t31 t41
long t35 t6 t73 t59 t11 t58 t69 t3 t61 t33 t71 t58 t72 t27 t53
long t59 t10 t71 t72 t42 t25 t71 t71 t27 t26 t7 t24 t20
short t49 t27 t79 t33
mid t44 t49 t27 t42 t11 t66 t55 t50 t68 t1
long t55 t65 t44 t32 t23 t15 t47 t41 t61 t40 t11 t74 t69 t72
short t44 t60 t9 t1
short t75 t29 t6 t31 t65 t48
long t62 t39 t21 t60 t11 t18 t45 t75 t41 t73 t73 t4 t68 t7
long t65 t3 t4 t60 t76 t55 t46 t35 t54 t33 t25 t28 t62 t55
short t20 t20 t38
long t5 t4 t14 t31 t35 t43 t3 t43 t62 t53 t50 t72 t56 t50
short t63 t3 t61 t33 t6 t4
mid t72 t75 t50 t14 t35 t0 t20 t47 t30
short t7 t37 t0 t21
mid t5 t75 t17 t0 t10 t19 t31
mid t22 t53 t5 t1 t55 t26 t23 t39
long t10 t40 t38 t39 t75 t5 t14 t65 t38 t45 t77 t79 t48
short t37 t19 t2 t1 t60
short t40 t2 t62 t55 t62 t13
short t56 t48 t29 t55
long t20 t70 t77 t4 t5 t1 t33 t71 t17 t11 t17
short t38 t65 t55 t46
long t68 t52 t73 t22 t13 t55 t27 t48 t51 t69 t11 t49 t15
mid t32 t10 t38 t66 t48 t27 t54
short t9 t3 t34 t32 t33
short t43 t64 t9
short t54 t63 t12 t6
long t70 t76 t50 t46 t1 t59 t57 t43 t45 t31 t62 t50 t46 t12
long t47 t24 t39 t43 t3 t68 t22 t77 t23 t46 t5
long t55 t61 t22 t67 t3 t70 t46 t72 t68 t0 t26 t38 t74 t51 t9
mid t22 t79 t66 t33 t54 t49 t2 t74 t65 t57
short t54 t76 t23 t12 t30
mid t78 t64 t40 t70 t69 t69 t4 t77 t14
short t67 t33 t35 t45 t78
long t71 t58 t43 t39 t21 t73 t57 t47 t1 t74 t44 t65
long t47 t0 t53 t48 t24 t45 t10 t76 t55 t31 t45 t64 t46 t35 t48
long t63 t63 t25 t16 t68 t34 t27 t27 t56 t47 t26 t61
short t57 t11 t33 t16 t5
long t75 t58 t73 t21 t71 t10 t45 t25 t55 t68 t23
mid t9 t71 t36 t16 t43 t45 t41 t17 t60
mid t63 t5 t63 t66 t57 t24 t22
mid t13 t57 t76 t76 t59 t48 t48 t5 t42
short t13 t11 t69 t14 t51
short t15 t14 t40 t26
long t1 t46 t11 t75 t35 t47 t19 t36 t48 t6 t6
long t23 t78 t41 t10 t26 t49 t60 t40 t67 t40 t71
short t16 t4 t64 t54
mid t40 t41 t54 t74 t43 t66 t61
short t6 t73 t64 t61 t54 t29
long t5 t71 t23 t35 t53 t0 t47 t64 t25 t48 t20
short t9 t25 t74 t38
short t1 t55 t67 t73 t22 t50
short t59 t24 t75
long t36 t21 t31 t44 t29 t3 t68 t1 t23 t35 t23 t40 t7 t16
long t37 t65 t77 t18 t41 t28 t1 t8 t68 t47 t37 t15 t54
mid t10 t51 t12 t56 t0 t74 t22 t56 t31
long t68 t23 t57 t53 t78 t41 t67 t9 t62 t11 t59
mid t64 t64 t16 t50 t15 t10 t38
long t70 t45 t23 t53 t11 t73 t43 t69 t73 t48 t31 t70 t10 t1 t36
long t68 t44 t70 t15 t51 t43 t52 t41 t47 t58 t49
mid t68 t39 t37 t72 t3 t79 t19 t9
short t57 t76 t27 t28 t77 t25
short t14 t39 t58
short t23 t68 t20 t78
short t63 t49 t19 t56
short t24 t6 t79 t77 t43
long t27 t16 t12 t18 t22 t15 t26 t17 t54 t49 t63 t53 t34
long t63 t56 t58 t20 t25 t5 t79 t52 t25 t57 t55
long t4 t62 t78 t54 t34 t34 t15 t4 t61 t22 t14 t78 t12 t36 t36
mid t55 t13 t38 t14 t10 t15 t50
long t1 t9 t49 t54 t12 t60 t32 t71 t78 t37 t78 t10 t76 t48
mid t15 t10 t77 t35 t4 t70 t53 t71
long t12 t57 t78 t30 t10 t42 t50 t28 t28 t21 t47 t54 t18
mid t25 t4 t0 t6 t42 t40 t21
mid t32 t38 t73 t23 t48 t40 t78 t4
long t44 t64 t77 t12 t59 t77 t33 t56 t44 t60 t9 t32
long t15 t49 t12 t12 t13 t14 t2 t12 t10 t39 t24 t48 t64 t41
long t48 t54 t56 t4 t8 t54 t67 t16 t3 t66 t58 t47 t31
long t64 t24 t23 t68 t64 t6 t13 t64 t77 t10 t38 t36 t71 t71 t56
mid t34 t16 t32 t1 t34 t73 t51 t79
short t46 t32 t0
short t73 t60 t31 t27
long t33 t68 t56 t1 t73 t13 t57 t61 t49 t35 t35
mid t22 t29 t30 t59 t62 t70 t26 t77 t56
long t52 t72 t1 t40 t71 t66 t65 t3 t37 t51 t69
short t32 t75 t7 t23 t63
long t48 t58 t10 t3 t57 t45 t45 t50 t29 t62 t19 t33 t4
short t34 t47 t37 t67
short t63 t73 t32 t26 t37
short t61 t6 t76
short t25 t74 t7 t59 t47
short t27 t20 t30 t59 t55 t47
short t78 t2 t41
mid t68 t61 t78 t55 t47 t35 t56 t10 t42 t12
long t54 t60 t28 t51 t52 t60 t52 t21 t25 t79 t36 t78
mid t12 t20 t38 t74 t48 t12 t66
short t78 t15 t77
long t63 t47 t3 t13 t47 t43 t55 t4 t68 t55 t56 t4
long t29 t74 t14 t4 t2 t58 t12 t43 t63 t15 t49
long t33 t48 t32 t41 t45 t36 t6 t21 t34 t8 t59
long t38 t19 t9 t50 t12 t64 t20 t18 t20 t50 t14 t58 t35 t20
long t51 t74 t21 t64 t27 t73 t16 t15 t29 t58 t24 t9 t5 t51
short t35 t72 t12 t0
long t55 t55 t0 t63 t30 t19 t21 t62 t77 t55 t16 t59 t9
short t69 t49 t79
long t69 t48 t36 t14 t57 t67 t8 t57 t70 t5 t36 t31 t64 t55
short t48 t46 t40 t5
mid t20 t36 t77 t37 t64 t49 t47 t45
short t4 t18 t35
long t78 t7 t26 t30 t60 t8 t3 t2 t23 t2 t37 t0 t50 t63 t4
mid t55 t18 t79 t14 t40 t31 t67 t31 t38
short t73 t28 t53 t53 t23 t16
long t58 t54 t25 t70 t21 t27 t31 t40 t32 t15 t22 t9
short t48 t66 t17 t0 t41 t38
long t3 t20 t66 t72 t36 t19 t13 t1 t61 t71 t24
mid t21 t69 t31 t73 t48 t49 t60 t0 t77
long t35 t65 t28 t57 t21 t9 t47 t6 t13 t26 t26 t23 t70
short t51 t22 t4
mid t60 t50 t11 t14 t60 t39 t65 t9 t46 t15
short t2 t45 t39 t58
short t36 t46 t9 t5 t46
short t2 t4 t26 t10 t66
long t79 t9 t65 t66 t39 t75 t13 t23 t50 t0 t29 t39 t78 t78
long t53 t48 t65 t74 t40 t59 t38 t13 t57 t33 t33 t37 t74
mid t56 t22 t52 t24 t23 t68 t32
short t47 t33 t41 t19
long t5 t58 t38 t13 t56 t76 t56 t26 t36 t33 t74 t43 t48 t65 t59
short t79 t76 t67
short t37 t61 t9 t28 t15 t48
mid t37 t44 t39 t46 t65 t41 t61 t40 t37 t24
short t50 t58 t38
short t28 t2 t38
short t39 t37 t23 t76
short t49 t39 t63
mid t60 t36 t39 t5 t40 t49 t11 t77 t75
long t5 t32 t52 t76 t79 t29 t26 t74 t59 t4 t71 t74 t23 t74 t49
short t29 t23 t71
long t57 t79 t76 t35 t28 t31 t21 t49 t68 t60 t24 t67 t24
mid t68 t19 t11 t34 t59 t5 t6 t70 t24
short t36 t35 t30 t50 t13 t13
short t45 t14 t38 t79
short t68 t3 t69 t47 t59
mid t21 t4 t71 t35 t31 t39 t48
mid t36 t79 t73 t60 t22 t45 t67 t79 t13 t54
mid t16 t36 t57 t43 t20 t70 t9 t43
long t1 t16 t32 t52 t58 t1 t45 t43 t49 t13 t55 t39 t38
long t14 t10 t74 t30 t41 t15 t5 t58 t29 t58 t0
short t16 t70 t76 t29 t70
long t45 t67 t11 t13 t25 t65 t75 t78 t2 t25 t0 t27 t69 t11 t36
long t30 t21 t54 t35 t55 t32 t7 t65 t71 t69 t39 t13 t36 t77 t2
mid t16 t56 t78 t54 t12 t77 t42 t70
mid t39 t46 t14 t68 t28 t58 t58 t15
mid t10 t60 t21 t77 t44 t67 t59 t3 t55
long t59 t42 t45 t43 t22 t43 t51 t53 t70 t29 t20 t69 t60 t61 t75
long t59 t76 t27 t38 t68 t39 t64 t45 t3 t52 t37 t19
long t44 t30 t14 t22 t75 t40 t42 t6 t77 t6 t27 t18 t64
long t15 t3 t3 t68 t40 t69 t59 t79 t41 t29 t18 t12 t10 t26
long t40 t34 t64 t14 t28 t46 t14 t20 t52 t10 t65 t57 t35 t55 t22
mid t46 t27 t16 t76 t36 t36 t37 t75 t47 t60
long t47 t49 t10 t15 t5 t73 t65 t20 t38 t7 t16 t58 t30 t30
short t18 t3 t12 t9 t10
long t60 t18 t13 t54 t25 t21 t37 t75 t66 t74 t11 t71 t65 t16 t66
long t1 t43 t38 t25 t70 t53 t25 t30 t10 t46 t3 t65 t27
short t1 t67 t56
long t37 t60 t23 t14 t37 t65 t33 t32 t65 t68 t46
mid t62 t5 t6 t73 t44 t67 t15 t65
short t37 t7 t36 t37 t78
long t10 t71 t27 t64 t10 t38 t63 t22 t61 t65 t58 t15 t16 t76
short t74 t68 t55
mid t46 t79 t35 t33 t15 t70 t16 t18
long t75 t74 t28 t61 t53 t22 t3 t37 t44 t18 t40 t77
short t68 t17 t13
mid t31 t4 t69 t5 t59 t64 t59 t16
mid t73 t74 t79 t10 t63 t29 t20
long t57 t74 t0 t32 t5 t54 t21 t59 t47 t49 t61 t2
short t37 t4 t1
short t78 t54 t13
short t75 t38 t61
mid t44 t42 t49 t53 t5 t49 t28
short t3 t58 t51 t40 t48 t7
short t16 t40 t35
long t50 t71 t56 t59 t53 t54 t58 t69 t33 t57 t26
long t72 t64 t26 t3 t14 t52 t36 t66 t23 t34 t13 t78 t36
mid t60 t68 t11 t52 t11 t2 t21 t76 t21
mid t11 t62 t53 t30 t58 t37 t62 t62 t32 t54
mid t49 t67 t0 t77 t46 t11 t66 t52
mid t28 t39 t78 t79 t31 t29 t21
mid t62 t46 t62 t77 t26 t31 t62 t46 t34
short t31 t15 t3 t71 t41 t23
long t62 t75 t55 t20 t79 t59 t17 t38 t36 t36 t37 t13 t51 t13 t35
mid t35 t70 t42 t69 t25 t64 t56 t62
short t51 t47 t71 t56 t15 t69
mid t36 t30 t68 t23 t21 t13 t7 t51 t63
short t6 t49 t71
mid t77 t62 t10 t6 t59 t33 t39 t22 t10 t69
long t21 t58 t69 t14 t0 t1 t52 t77 t34 t45 t41 t55
mid t68 t27 t21 t26 t26 t41 t15 t55
long t12 t24 t9 t71 t65 t9 t14 t23 t9 t9 t58 t58
mid t39 t26 t6 t5 t65 t62 t51 t33 t36 t1
short t75 t22 t6 t50
mid t50 t5 t9 t28 t78 t32 t25 t32 t51 t59
mid t73 t16 t76 t0 t40 t66 t40 t75 t73
short t7 t56 t60 t71 t79 t63
mid t75 t77 t34 t29 t53 t65 t61 t78
mid t33 t8 t56 t13 t52 t44 t73
long t49 t70 t29 t3 t75 t72 t9 t66 t40 t2 t62 t2
mid t30 t9 t45 t35 t7 t25 t51 t41
mid t32 t10 t67 t31 t10 t34 t38 t29 t52 t27
long t67 t37 t0 t51 t54 t37 t12 t47 t4 t39 t35 t71 t28 t39 t64
mid t75 t17 t9 t14 t60 t53 t37 t4 t72
long t15 t8 t23 t64 t70 t73 t25 t37 t76 t56 t67 t48 t27
long t1 t44 t72 t57 t12 t4 t73 t56 t23 t70 t72 t69 t19 t26
mid t51 t77 t57 t48 t47 t73 t23 t24 t53
long t37 t33 t51 t20 t39 t38 t70 t16 t57 t65 t23 t79 t12 t45 t52
long t11 t58 t57 t6 t68 t56 t60 t21 t40 t3 t8 t35
mid t72 t12 t15 t3 t65 t40 t4 t48 t25 t39
mid t69 t65 t29 t35 t31 t20 t52 t58 t56 t39
long t72 t78 t34 t22 t11 t35 t46 t64 t50 t74 t36 t10 t42 t50
long t73 t46 t69 t31 t41 t34 t73 t76 t43 t75 t18 t2 t4 t8
short t22 t46 t57
long t9 t1 t67 t4 t62 t56 t43 t7 t78 t15 t45
long t8 t63 t47 t76 t34 t39 t72 t2 t15 t41 t8 t70 t3 t13
long t69 t72 t23 t35 t49 t73 t37 t50 t64 t35 t74 t41 t33 t64
long t67 t66 t64 t40 t63 t16 t37 t65 t20 t20 t62
long t30 t49 t42 t20 t42 t18 t18 t77 t47 t37 t31 t49 t71 t20 t9
long t4 t22 t15 t38 t46 t23 t58 t37 t60 t35 t28 t17
long t47 t16 t51 t73 t41 t16 t2 t73 t35 t34 t58
mid t30 t42 t6 t58 t4 t31 t57
mid t32 t2 t21 t39 t7 t50 t29 t13
long t6 t55 t8 t2 t54 t12 t1 t39 t32 t31 t28 t44 t74
long t46 t29 t69 t18 t47 t23 t46 t1 t4 t67 t33
short t45 t6 t18 t28 t18
mid t3 t10 t54 t50 t76 t53 t10 t6
long t69 t24 t31 t25 t21 t41 t20 t23 t45 t69 t62
long t39 t37 t21 t45 t78 t9 t55 t63 t53 t26 t35 t75 t35 t57 t56
short t32 t18 t24 t40 t41 t2
mid t50 t29 t9 t2 t31 t10 t74
long t2 t31 t3 t56 t58 t58 t76 t39 t15 t17 t39 t23
mid t17 t69 t11 t71 t1 t3 t24 t39 t40 t63
long t69 t16 t70 t45 t75 t54 t59 t29 t32 t72 t21
mid t20 t49 t8 t28 t56 t11 t73 t73 t30 t8
short t15 t1 t24 t76 t15 t51
long t62 t33 t54 t33 t14 t24 t1 t43 t35 t25 t47 t61 t6 t11
short t42 t51 t21 t57
mid t23 t57 t47 t24 t61 t79 t70 t36
short t44 t71 t75
short t20 t52 t15
short t62 t35 t65 t21
mid t27 t50 t19 t5 t27 t44 t11
long t16 t58 t46 t52 t45 t55 t58 t51 t37 t49 t31 t43 t48
long t69 t50 t78 t46 t53 t32 t57 t31 t27 t53 t3 t19 t73 t0
long t39 t67 t76 t53 t8 t68 t20 t67 t78 t61 t43 t59 t64
long t47 t32 t71 t74 t32 t28 t45 t46 t75 t43 t61 t21 t77 t44 t27
mid t28 t25 t73 t21 t54 t24 t29
mid t60 t54 t70 t75 t46 t46 t28 t15 t11 t33
mid t79 t8 t37 t7 t38 t20 t51 t14
long t44 t59 t3 t6 t1 t35 t70 t1 t46 t3 t71 t0 t41
short t13 t49 t6 t20
mid t78 t70 t8 t41 t78 t73 t1 t21
short t16 t55 t25 t73 t54 t70
short t16 t17 t13 t27
short t24 t49 t76 t66 t16 t54
mid t39 t24 t27 t79 t49 t59 t42 t32 t8
short t73 t13 t37 t50
short t32 t66 t47 t51 t5
long t61 t44 t13 t6 t62 t62 t55 t60 t12 t71 t72 t3 t25 t17
mid t70 t31 t41 t37 t27 t44 t13 t34 t19
short t52 t13 t56
short t10 t79 t47 t12 t21
long t3 t75 t46 t13 t33 t16 t2 t19 t49 t58 t52 t41 t41
long t41 t55 t13 t52 t21 t53 t49 t6 t21 t58 t67 t31 t79 t38
long t19 t67 t6 t36 t3 t50 t51 t7 t60 t25 t79 t68 t71
long t32 t33 t35 t22 t24 t40 t18 t52 t71 t41 t42 t12 t36 t39 t23
long t12 t27 t73 t17 t55 t16 t50 t59 t73 t73 t22 t45 t19 t3
short t77 t41 t22 t60 t61
short t69 t74 t19 t73
mid t56 t69 t16 t55 t23 t72 t4
long t3 t55 t39 t54 t51 t31 t8 t72 t54 t45 t65 t5
short t68 t31 t45 t22 t59 t68
long t57 t32 t68 t67 t71 t59 t70 t50 t44 t74 t18 t71 t0 t61 t44
long t73 t23 t3 t52 t79 t64 t22 t14 t7 t9 t52 t15 t23
long t53 t59 t61 t29 t73 t2 t53 t68 t65 t77 t20
short t72 t64 t46 t52
short t1 t53 t77 t21 t75
short t15 t22 t26 t13
long t35 t74 t12 t19 t38 t73 t26 t16 t48 t2 t61
long t30 t20 t68 t5 t49 t14 t79 t78 t58 t9 t64 t50 t73 t2
long t60 t46 t39 t32 t53 t75 t58 t27 t61 t40 t2 t30 t19
short t51 t66 t29 t28 t76
short t73 t42 t8 t69
long t48 t39 t52 t25 t5 t40 t23 t26 t41 t31 t78
long t0 t50 t35 t33 t45 t15 t34 t50 t32 t10 t16 t6 t43
long t76 t36 t33 t54 t67 t48 t12 t14 t64 t57 t33
long t52 t10 t29 t62 t37 t44 t21 t34 t17 t57 t43 t57 t22 t4 t15
short t28 t40 t53 t13
mid t56 t19 t15 t5 t74 t75 t42 t25
mid t21 t43 t48 t20 t22 t51 t3 t64
mid t72 t76 t12 t6 t37 t30 t28 t70
long t0 t24 t23 t29 t4 t27 t17 t43 t30 t30 t78 t0 t59 t33 t74
long t2 t35 t54 t24 t29 t14 t16 t45 t30 t16 t78 t61 t53
long t47 t77 t60 t56 t6 t41 t9 t6 t54 t74 t28 t67 t30
short t42 t23 t59 t30
long t0 t60 t77 t29 t8 t23 t76 t12 t24 t38 t62
short t68 t18 t63 t57 t31 t33
short t46 t13 t2
long t21 t35 t11 t5 t42 t36 t49 t24 t65 t30 t60 t17 t27 t19
long t16 t34 t26 t75 t77 t47 t14 t65 t79 t50 t40 t53 t1 t45 t79
short t9 t27 t37 t13 t72 t9
long t32 t15 t10 t56 t44 t11 t49 t49 t4 t46 t4
short t27 t40 t75
mid t42 t67 t0 t22 t11 t27 t35 t19
short t76 t65 t19 t39 t17 t14
long t50 t54 t43 t26 t60 t21 t78 t69 t54 t30 t53 t68 t50 t52 t40
mid t49 t10 t74 t78 t78 t69 t4 t0
long t48 t58 t34 t71 t23 t79 t63 t13 t49 t13 t3 t3 t15
long t32 t27 t59 t4 t76 t21 t36 t23 t30 t67 t24 t67 t44 t35
short t12 t34 t20
short t9 t79 t33 t52
mid t63 t58 t35 t5 t30 t78 t60
mid t22 t37 t50 t50 t35 t49 t55
mid t28 t17 t53 t4 t57 t71 t40
short t43 t28 t60 t7 t8
long t1 t75 t17 t37 t37 t40 t78 t14 t33 t28 t11 t26 t59 t78
long t38 t65 t33 t48 t29 t52 t34 t65 t77 t69 t30 t7 t5 t45
long t20 t52 t39 t1 t30 t49 t40 t78 t21 t62 t19 t31 t31
long t69 t67 t57 t47 t56 t55 t16 t27 t24 t59 t14 t52 t13 t9 t70
long t72 t14 t10 t69 t26 t5 t52 t37 t41 t23 t53 t23 t4 t74 t65
long t16 t47 t31 t21 t54 t19 t9 t43 t2 t76 t19
long t55 t56 t72 t27 t68 t49 t11 t73 t48 t41 t41 t31 t6
mid t71 t79 t50 t44 t79 t61 t9 t67 t63
short t67 t42 t27 t34
long t25 t78 t44 t69 t37 t39 t41 t44 t9 t41 t16 t39
short t15 t5 t9 t12 t32 t17
mid t74 t74 t5 t78 t40 t48 t70
long t49 t55 t55 t20 t7 t41 t17 t24 t24 t0 t1
short t64 t40 t18 t12 t68 t74
short t51 t58 t58
short t19 t60 t62 t7 t65 t60
long t28 t34 t57 t71 t78 t42 t11 t42 t45 t48 t36 t64 t74
long t32 t17 t0 t29 t52 t13 t51 t70 t59 t69 t61 t16 t63
mid t0 t47 t74 t59 t50 t54 t27 t36
mid t39 t21 t56 t27 t7 t30 t25
short t38 t14 t22 t70
long t31 t58 t16 t56 t62 t10 t38 t65 t14 t70 t51 t54 t22 t51
mid t51 t55 t23 t60 t70 t40 t38
mid t4 t1 t22 t62 t26 t25 t74 t11 t49
long t44 t1 t43 t58 t27 t49 t4 t58 t9 t19 t17 t75 t52 t73 t25
long t3 t55 t40 t41 t24 t31 t16 t59 t36 t1 t32 t38 t24
long t23 t27 t67 t40 t2 t72 t43 t17 t73 t32 t52
long t43 t31 t40 t77 t15 t0 t49 t17 t16 t72 t30 t10
mid t47 t54 t4 t5 t70 t77 t14 t77 t3 t33
short t56 t37 t13 t14 t70 t41
mid t57 t23 t24 t16 t33 t67 t68
short t64 t62 t1 t45 t47
long t62 t31 t50 t54 t63 t77 t28 t44 t24 t51 t66 t2 t7 t71
mid t31 t15 t73 t15 t2 t47 t58 t40 t10
short t63 t6 t42 t72 t25
mid t9 t4 t30 t8 t41 t1 t65
long t48 t35 t35 t9 t21 t59 t46 t53 t18 t39 t33 t20 t22 t58
short t14 t34 t13 t43 t32 t39
long t10 t60 t60 t7 t34 t37 t50 t11 t36 t2 t16 t26 t28 t75 t74
short t21 t67 t15 t36 t30 t44
short t32 t25 t21 t52 t2
mid t61 t33 t40 t67 t67 t37 t26 t17 t39
mid t58 t58 t6 t66 t3 t76 t11 t17 t45 t22
mid t65 t14 t60 t40 t68 t8 t15
mid t77 t28 t60 t67 t22 t56 t63 t63
mid t40 t58 t25 t44 t4 t15 t31 t68 t44 t8
short t29 t76 t65 t52
long t64 t71 t12 t14 t14 t75 t27 t52 t35 t57 t25 t5 t41 t47
short t24 t69 t72 t24 t9 t59
long t70 t38 t15 t76 t17 t67 t17 t71 t32 t7 t70 t71
long t23 t55 t17 t39 t60 t12 t7 t42 t16 t61 t0 t32
short t21 t6 t30 t38 t68
short t77 t44 t58 t1 t37 t59
mid t57 t44 t32 t59 t44 t76 t32 t12 t8 t38
long t68 t47 t15 t43 t45 t3 t50 t62 t46 t71 t47 t65 t4 t75 t60
short t16 t49 t23
short t44 t54 t59
mid t74 t55 t75 t46 t18 t54 t33 t6 t25
long t21 t60 t29 t2 t20 t65 t72 t1 t11 t59 t7 t76
short t37 t11 t17
mid t50 t26 t32 t77 t22 t20 t40 t1 t3 t38
mid t42 t45 t58 t59 t0 t23 t54 t74
short t3 t40 t29 t73 t70
long t41 t56 t63 t37 t37 t8 t57 t2 t40 t74 t18 t18 t31
long t73 t48 t7 t6 t65 t63 t55 t26 t1 t64 t50 t29 t41 t51 t39
mid t30 t72 t48 t49 t22 t3 t28
long t29 t78 t62 t44 t61 t53 t32 t43 t67 t33 t47 t51 t69
short t79 t53 t52
long t40 t71 t47 t57 t26 t30 t0 t11 t60 t51 t26
mid t28 t49 t69 t62 t18 t20 t2
short t22 t37 t68 t54
short t60 t59 t42 t22
short t77 t31 t33 t56 t60 t78
long t33 t14 t56 t76 t34 t50 t0 t27 t73 t28 t18 t64 t38 t54
mid t4 t16 t18 t61 t79 t34 t46 t0
short t22 t58 t30 t1 t50 t40
short t0 t69 t59 t10 t17 t70
long t30 t26 t46 t40 t54 t49 t38 t75 t72 t29 t33 t15
short t75 t77 t63 t42 t14 t36
mid t50 t35 t8 t68 t5 t32 t23 t24
mid t52 t12 t34 t27 t24 t47 t1 t24
mid t45 t74 t50 t70 t13 t75 t24 t32 t1 t28
mid t79 t77 t11 t53 t19 t0 t51 t60 t21 t19
long t62 t38 t19 t30 t71 t36 t23 t28 t63 t37 t56 t42 t6
long t25 t56 t14 t51 t32 t54 t21 t0 t56 t36 t59
long t46 t9 t54 t77 t50 t66 t1 t29 t59 t31 t35 t6 t50 t73 t5
short t24 t73 t2 t33 t11 t58
long t57 t25 t9 t4 t69 t49 t63 t3 t39 t3 t6 t55 t25
long t14 t6 t24 t13 t46 t14 t40 t67 t59 t42 t56 t30 t47
mid t4 t22 t43 t12 t78 t57 t78 t59
short t18 t20 t78 t7 t46 t61
mid t19 t19 t21 t21 t66 t41 t62 t54 t3 t79
mid t62 t50 t53 t9 t67 t10 t38 t22 t38
short t74 t61 t74 t8
short t6 t22 t69 t68 t40
short t34 t8 t6 t15
long t19 t14 t75 t69 t27 t41 t37 t75 t56 t52 t8
mid t66 t62 t50 t5 t53 t53 t63 t65 t21 t59
mid t44 t11 t28 t1 t75 t67 t7
short t63 t35 t15
long t43 t25 t34 t18 t45 t53 t45 t39 t23 t22 t11 t9 t76 t42
long t15 t54 t3 t47 t44 t50 t68 t53 t58 t23 t6 t43 t46 t54 t16
mid t9 t57 t61 t31 t19 t22 t59
short t24 t58 t33 t5 t31
mid t66 t65 t48 t54 t20 t69 t5
long t21 t62 t17 t47 t64 t11 t18 t60 t2 t12 t70 t36 t14 t51 t30
long t24 t72 t49 t56 t7 t18 t5 t15 t59 t30 t78
mid t48 t77 t65 t26 t75 t42 t2
short t29 t79 t23
mid t79 t28 t64 t32 t13 t48 t6 t74 t28 t19
mid t14 t41 t48 t3 t51 t4 t33 t42 t64 t52
long t58 t65 t34 t29 t45 t24 t21 t32 t73 t21 t35 t38
long t21 t63 t28 t32 t62 t11 t36 t42 t41 t16 t55 t62 t38 t52
mid t66 t78 t15 t42 t51 t2 t27 t31 t28 t63
long t35 t77 t59 t3 t63 t0 t39 t15 t67 t73 t8 t22 t54
short t72 t32 t16 t51
long t16 t28 t46 t14 t47 t31 t1 t73 t27 t0 t69 t45 t31 t42
long t33 t37 t15 t11 t65 t65 t14 t68 t32 t64 t24
long t50 t20 t69 t66 t8 t53 t68 t40 t59 t19 t4 t59 t8 t58
long t79 t35 t77 t67 t17 t54 t68 t51 t69 t48 t78 t63 t40 t76 t43
mid t59 t26 t43 t11 t9 t16 t7 t21 t13
mid t32 t58 t43 t67 t49 t65 t49 t71
long t33 t1 t25 t41 t10 t57 t30 t55 t50 t62 t31 t32
long t66 t48 t18 t79 t4 t17 t15 t19 t13 t67 t0
short t79 t65 t61 t14 t49
long t60 t71 t68 t16 t75 t23 t50 t56 t17 t2 t19 t12 t50 t6 t38
mid t62 t59 t1 t64 t3 t37 t48 t11 t4 t60
mid t51 t68 t55 t25 t43 t8 t21 t59 t18
long t30 t33 t68 t40 t40 t7 t39 t8 t59 t40 t58
mid t78 t59 t53 t47 t70 t32 t28 t41 t21 t40
short t6 t48 t56 t15 t1 t46
long t66 t26 t57 t30 t37 t29 t51 t63 t34 t36 t11 t56
long t21 t43 t31 t74 t34 t37 t43 t8 t30 t57 t22
long t73 t44 t17 t7 t33 t12 t43 t14 t48 t4 t42
short t26 t42 t40 t35
long t17 t38 t31 t1 t76 t16 t38 t79 t57 t37 t79
mid t43 t12 t3 t51 t76 t77 t20
short t43 t50 t6 t62 t62 t8
long t28 t29 t13 t50 t77 t3 t79 t24 t76 t34 t42 t50 t26 t15 t58
short t62 t7 t59
short t61 t59 t38 t2 t61
long t54 t27 t68 t34 t20 t70 t57 t1 t0 t49 t71 t49 t66
long t69 t24 t54 t23 t45 t15 t18 t35 t56 t2 t56 t6 t66
mid t26 t39 t29 t15 t54 t64 t54 t37
short t19 t25 t54 t75 t36
mid t11 t12 t77 t9 t41 t11 t1 t69 t2 t71
long t22 t38 t65 t32 t27 t23 t67 t38 t58 t2 t64 t40 t11 t21 t74
short t29 t73 t57 t58 t62 t71
long t61 t52 t41 t4 t16 t33 t74 t69 t34 t62 t57 t0
mid t41 t72 t6 t52 t31 t75 t16
mid t72 t46 t55 t50 t39 t42 t36
mid t67 t45 t14 t24 t2 t56 t10
short t9 t19 t14
mid t30 t66 t5 t27 t55 t55 t1 t18 t72 t36
long t33 t20 t69 t57 t19 t16 t34 t58 t78 t8 t30
mid t43 t50 t19 t48 t38 t63 t0 t51 t22
short t41 t45 t10 t44 t49 t56
mid t50 t50 t46 t31 t52 t35 t62 t50 t72
mid t42 t76 t30 t25 t28 t58 t31 t1 t28
mid t4 t6 t37 t47 t54 t1 t36
mid t8 t65 t2 t3 t62 t64 t67 t4
short t21 t6 t37 t39 t22 t41
long t65 t77 t78 t73 t33 t75 t8 t52 t62 t31 t26 t44 t79 t9
long t65 t48 t53 t39 t5 t34 t21 t32 t12 t50 t49 t30 t41 t73 t18
short t59 t0 t60 t2 t72 t55
long t29 t58 t75 t59 t26 t36 t48 t20 t77 t76 t35
mid t42 t64 t5 t78 t18 t17 t36 t15 t18
short t22 t8 t72 t4
long t13 t74 t30 t77 t58 t48 t58 t32 t11 t75 t13
long t29 t74 t33 t61 t0 t21 t35 t32 t36 t14 t75 t39 t40 t41
short t35 t27 t19 t5 t16 t2
long t38 t10 t61 t76 t44 t54 t77 t73 t12 t32 t56 t70 t34
long t25 t74 t31 t45 t24 t13 t67 t38 t74 t16 t10 t42 t59
short t27 t46 t67 t50 t71
short t76 t20 t56 t58
long t36 t2 t6 t47 t33 t20 t58 t21 t30 t9 t12
short t40 t67 t66 t49
long t21 t68 t52 t50 t27 t36 t29 t16 t8 t33 t48 t59 t50 t19
long t12 t57 t48 t49 t59 t19 t47 t61 t32 t13 t6 t56 t7
short t29 t14 t14 t22 t46 t75
short t10 t8 t37 t8 t60 t59
mid t53 t31 t55 t77 t66 t64 t71 t75 t24
short t79 t58 t7 t40 t47 t8
short t9 t48 t66 t0 t62
mid t42 t19 t45 t33 t48 t32 t66
mid t40 t33 t40 t11 t10 t30 t39
long t5 t37 t2 t78 t70 t63 t54 t27 t35 t21 t36 t79 t77 t57
long t59 t65 t5 t45 t13 t23 t0 t58 t38 t44 t57 t49 t49 t25
long t36 t77 t44 t62 t48 t40 t35 t71 t70 t6 t77 t41 t5 t73 t43
mid t52 t20 t54 t35 t28 t28 t37
long t23 t36 t78 t64 t38 t11 t16 t53 t3 t13 t28
short t11 t72 t73 t76
mid t47 t64 t48 t10 t14 t74 t39 t68 t18 t29
long t61 t6 t13 t8 t62 t65 t23 t1 t48 t20 t29 t31 t67
long t26 t60 t42 t60 t25 t32 t11 t57 t68 t45 t53 t4 t74 t79 t71
long t22 t4 t39 t27 t18 t15 t68 t66 t32 t79 t57 t75 t50 t49 t71
long t32 t22 t1 t36 t35 t23 t57 t62 t63 t4 t18 t44
short t18 t4 t54 t67
long t15 t36 t64 t66 t69 t28 t59 t51 t44 t8 t22 t34 t18 t67
long t76 t24 t6 t41 t43 t24 t23 t67 t64 t35 t60 t0
short t13 t50 t41 t9
mid t12 t20 t16 t24 t41 t11 t11 t70
short t1 t42 t15 t59
long t66 t18 t36 t78 t32 t61 t77 t31 t53 t26 t51 t38
mid t59 t62 t53 t47 t22 t35 t31 t57 t33
mid t63 t74 t71 t12 t71 t1 t30
long t46 t28 t23 t51 t6 t13 t18 t4 t49 t59 t74 t55 t52 t73
short t71 t16 t6
short t60 t58 t54
short t28 t20 t2 t42 t63
long t2 t71 t69 t54 t10 t57 t17 t4 t68 t72 t18 t9 t48 t20 t49
long t46 t4 t70 t77 t2 t72 t68 t59 t5 t35 t50
mid t67 t6 t63 t64 t26 t13 t66 t28
long t54 t15 t0 t44 t52 t52 t51 t2 t18 t9 t19 t24 t44 t8 t19
mid t10 t44 t22 t11 t47 t34 t14
mid t12 t44 t21 t55 t73 t49 t13 t77
mid t16 t15 t4 t30 t75 t60 t42 t8 t1 t56
long t36 t59 t61 t8 t45 t27 t59 t29 t1 t35 t24
short t78 t28 t33 t32
long t77 t52 t5 t8 t19 t52 t29 t67 t48 t35 t19 t55
mid t4 t57 t11 t59 t36 t48 t44
mid t35 t75 t30 t37 t26 t23 t24
long t23 t49 t9 t12 t5 t46 t37 t27 t30 t12 t23
short t39 t54 t52
long t72 t33 t29 t68 t57 t39 t76 t52 t0 t64 t10 t26 t27 t50 t0
long t10 t41 t22 t10 t43 t63 t70 t11 t12 t32 t50 t44
long t31 t78 t58 t29 t10 t2 t31 t50 t71 t48 t33
long t1 t17 t17 t12 t6 t1 t61 t52 t49 t0 t44 t24 t4 t27
long t59 t58 t58 t53 t58 t45 t76 t25 t55 t2 t8 t61 t74
long t24 t77 t29 t22 t68 t60 t52 t58 t46 t43 t26 t65 t44
long t36 t31 t59 t69 t23 t1 t62 t56 t62 t54 t59 t12 t65
long t14 t0 t15 t10 t18 t54 t75 t0 t48 t15 t10 t31 t69 t76 t40
short t47 t69 t30 t3 t58
short t69 t15 t30 t16
mid t5 t36 t17 t16 t43 t77 t39 t67
short t65 t69 t11 t49
long t41 t0 t10 t33 t68 t58 t29 t78 t55 t44 t76 t22 t65 t52
long t40 t46 t39 t4 t6 t46 t19 t23 t49 t22 t26
mid t3 t22 t9 t24 t45 t9 t39
mid t65 t10 t33 t25 t63 t9 t19 t46 t14
short t3 t70 t75
long t54 t1 t56 t42 t68 t69 t41 t79 t8 t71 t17 t33
short t24 t30 t4 t44
long t74 t48 t51 t73 t23 t78 t3 t44 t66 t64 t5 t12 t56 t62
short t15 t23 t23 t62 t68 t6
long t67 t54 t73 t41 t48 t31 t17 t29 t57 t66 t21 t7 t55
long t27 t34 t41 t78 t43 t7 t67 t73 t5 t33 t64 t4
mid t12 t17 t31 t25 t0 t2 t63 t63
mid t46 t34 t31 t79 t52 t65 t31
long t54 t34 t29 t52 t72 t28 t2 t36 t15 t60 t58 t25 t26 t27
long t13 t73 t47 t48 t68 t6 t65 t18 t41 t6 t12 t10 t8 t77 t0
mid t31 t19 t48 t54 t14 t26 t59 t33 t7
long t15 t61 t2 t25 t30 t70 t5 t73 t69 t15 t57 t27 t42
short t50 t15 t35
mid t47 t45 t47 t45 t49 t35 t57 t56 t55
short t22 t75 t49
mid t4 t30 t71 t46 t60 t15 t79 t72 t23 t13
short t68 t12 t55 t44
short t55 t22 t15 t32 t5 t57
short t46 t54 t53 t35 t30
mid t29 t37 t43 t58 t2 t29 t71
long t74 t21 t5 t25 t25 t27 t37 t26 t63 t58 t42 t65 t43 t41 t18
long t35 t18 t21 t62 t2 t59 t69 t25 t77 t12 t46 t36 t25
long t8 t45 t73 t6 t61 t70 t23 t59 t59 t46 t47
mid t0 t69 t10 t60 t61 t1 t57
short t17 t30 t43 t28 t12 t49
long t15 t39 t3 t26 t51 t39 t4 t75 t18 t29 t14 t61 t10 t9
mid t61 t49 t23 t27 t29 t63 t30
mid t43 t22 t26 t71 t25 t71 t32 t35 t58
short t49 t47 t49 t11 t41
short t36 t35 t6
mid t61 t12 t75 t26 t79 t34 t47 t32
long t44 t30 t25 t10 t41 t79 t74 t60 t25 t2 t8 t22 t69
short t57 t76 t3 t45 t43
mid t4 t55 t38 t65 t17 t57 t38
long t70 t22 t12 t64 t37 t44 t65 t16 t10 t79 t59 t42 t28
mid t48 t61 t25 t46 t54 t77 t9 t12
mid t26 t25 t68 t37 t53 t70 t68 t34
long t69 t29 t27 t55 t15 t20 t38 t17 t73 t39 t33 t46 t4 t77
mid t32 t58 t24 t79 t8 t43 t64 t19 t21
long t48 t44 t57 t19 t73 t54 t2 t48 t49 t62 t72
long t57 t43 t30 t51 t13 t36 t37 t42 t43 t40 t50 t56 t10 t40 t49
long t53 t40 t16 t23 t11 t23 t4 t40 t72 t58 t48 t2 t59 t29
mid t65 t37 t72 t41 t67 t7 t1 t68 t67
short t34 t30 t43
long t22 t36 t64 t31 t66 t31 t8 t12 t54 t20 t44 t5
short t19 t60 t17 t28 t39
long t55 t58 t22 t48 t69 t38 t41 t27 t12 t20 t68 t48
mid t10 t49 t23 t69 t30 t32 t16 t49 t55
mid t61 t48 t20 t0 t25 t55 t8 t75
long t12 t19 t76 t11 t62 t56 t40 t63 t58 t67 t56
mid t54 t23 t78 t46 t20 t33 t62 t47 t27 t34
long t30 t49 t57 t0 t31 t55 t16 t17 t77 t37 t62 t0 t20 t12
mid t46 t64 t17 t61 t64 t61 t55 t33 t28 t26
mid t44 t40 t68 t51 t8 t26 t77 t52
mid t19 t45 t49 t21 t42 t68 t51
mid t46 t38 t7 t62 t23 t40 t27 t16 t70 t71
mid t60 t62 t30 t58 t9 t59 t45 t22
long t37 t52 t37 t5 t11 t10 t56 t4 t79 t72 t9 t55 t23
mid t62 t51 t30 t17 t64 t33 t57 t30 t61 t43
short t31 t9 t45 t54
mid t23 t48 t34 t14 t1 t24 t47 t79
short t40 t7 t20 t12
mid t60 t51 t22 t65 t76 t70 t65 t4 t20
long t78 t51 t18 t68 t50 t79 t50 t69 t46 t36 t32 t13
long t79 t37 t36 t29 t25 t27 t23 t78 t15 t62 t69 t45 t16 t70
short t73 t61 t32
mid t37 t33 t56 t41 t48 t0 t53 t9
short t65 t28 t22 t8 t34
short t35 t14 t21 t32 t14 t53
mid t10 t71 t32 t56 t34 t24 t44
short t8 t24 t53 t77 t24 t14
short t60 t32 t16 t21 t36 t11
long t64 t28 t50 t17 t59 t74 t55 t27 t34 t18 t13 t61 t14 t9
long t69 t57 t4 t20 t35 t51 t20 t64 t71 t56 t70 t23 t21 t79 t1
short t25 t11 t27 t29
long t76 t41 t1 t53 t79 t67 t36 t39 t22 t9 t67
short t37 t57 t20
short t33 t54 t27 t6 t30
long t54 t44 t48 t5 t55 t52 t23 t36 t17 t53 t59 t15
short t56 t44 t30 t31 t43
short t52 t17 t31
short t78 t49 t73 t2 t1 t56
long t44 t44 t0 t23 t49 t16 t66 t13 t62 t18 t71 t7 t25
short t53 t60 t1
short t59 t54 t31 t7 t38 t16
long t74 t78 t10 t45 t22 t53 t14 t68 t20 t65 t63 t49 t78
long t45 t29 t19 t17 t65 t64 t64 t40 t69 t0 t4
short t28 t37 t2 t61 t45
long t22 t67 t71 t77 t79 t6 t17 t78 t27 t24 t32
short t38 t13 t11 t67
short t29 t2 t74 t75 t39 t22
long t5 t51 t12 t67 t43 t56 t6 t52 t79 t30 t10
mid t19 t60 t22 t21 t5 t50 t19 t68 t24 t37
short t22 t38 t41 t12 t67
mid t34 t59 t27 t54 t38 t0 t61 t79 t68 t21
short t58 t22 t14 t7
long t5 t66 t17 t78 t12 t62 t79 t47 t79 t39 t6
mid t7 t20 t63 t13 t41 t79 t17 t68 t7
mid t79 t31 t8 t22 t70 t18 t39
mid t50 t56 t8 t77 t15 t6 t1 t6
mid t18 t25 t66 t5 t2 t36 t77 t39
mid t62 t47 t57 t18 t31 t76 t68 t10 t39
mid t44 t21 t64 t45 t58 t33 t45 t8 t4 t62
short t15 t71 t79 t6 t23 t37
long t19 t52 t36 t43 t52 t31 t2 t64 t69 t15 t42 t60 t57 t19 t42
long t25 t48 t15 t8 t11 t57 t74 t68 t66 t34 t41
short t68 t30 t57 t17 t43 t78
long t33 t54 t75 t13 t70 t46 t12 t58 t66 t14 t18
short t60 t78 t2 t79
long t77 t1 t42 t17 t15 t38 t30 t47 t47 t21 t16
short t1 t62 t64 t20 t51 t30
long t8 t22 t20 t0 t32 t78 t5 t65 t68 t75 t11 t44 t21 t56 t14
long t22 t31 t10 t79 t22 t11 t5 t15 t23 t36 t27 t22 t21 t61 t4
short t65 t37 t30 t50 t47 t63
mid t62 t25 t60 t72 t19 t5 t50 t18 t56 t11
long t6 t11 t9 t66 t56 t6 t31 t46 t36 t36 t77
short t52 t40 t56 t37
mid t53 t59 t27 t79 t41 t54 t29 t63 t62
short t56 t76 t57 t34 t20
long t4 t70 t71 t72 t6 t4 t54 t54 t14 t34 t70 t64 t59 t10
long t30 t7 t45 t65 t60 t71 t7 t25 t17 t20 t42 t19 t56 t67
long t59 t70 t62 t76 t36 t75 t64 t41 t60 t54 t35
mid t33 t38 t57 t26 t60 t21 t77 t77 t70
long t19 t29 t24 t19 t19 t44 t37 t44 t46 t56 t40
long t70 t34 t5 t79 t24 t1 t61 t32 t29 t31 t64 t32 t33 t34 t35
long t63 t5 t51 t61 t70 t19 t27 t23 t16 t18 t6 t76 t25 t2 t59
long t70 t59 t37 t5 t1 t2 t62 t62 t69 t3 t7 t53 t10 t71 t51
mid t51 t28 t60 t79 t70 t75 t15 t5 t10 t62
long t30 t1 t25 t5 t18 t54 t74 t18 t47 t49 t34
mid t20 t56 t39 t28 t28 t29 t64 t70
long t55 t55 t50 t29 t21 t59 t27 t65 t71 t10 t21
short t71 t18 t5 t47
mid t8 t62 t28 t29 t45 t58 t72 t32 t75
short t73 t76 t51 t7 t3 t44
mid t64 t8 t41 t0 t28 t10 t10 t8 t9 t59
mid t9 t6 t24 t25 t47 t25 t34 t9 t63
long t49 t54 t5 t13 t60 t11 t23 t30 t60 t62 t78 t68 t79 t2
mid t54 t61 t11 t75 t56 t0 t27 t23 t20
short t74 t30 t56 t38
long t58 t30 t31 t56 t56 t71 t52 t4 t18 t7 t12
long t3 t20 t18 t41 t77 t64 t58 t19 t30 t51 t62 t23 t46
short t48 t21 t75 t8
mid t30 t29 t73 t5 t22 t14 t14
mid t23 t8 t67 t28 t26 t41 t66 t4
long t44 t29 t65 t60 t39 t33 t43 t77 t29 t49 t29 t28 t45
long t50 t69 t52 t16 t32 t62 t55 t54 t22 t59 t34
long t24 t20 t72 t4 t32 t33 t21 t64 t25 t60 t59 t28
short t29 t6 t35 t38
mid t16 t3 t13 t67 t29 t67 t5 t77 t36 t52
short t36 t30 t39 t75 t44 t1
short t54 t8 t44 t35 t63 t31
long t45 t42 t47 t65 t65 t60 t14 t47 t71 t0 t73 t5
short t10 t3 t1 t72 t32
long t17 t32 t15 t71 t20 t19 t78 t76 t53 t40 t67
short t41 t29 t50
long t27 t60 t26 t68 t64 t49 t70 t43 t70 t14 t0 t1
short t57 t62 t64 t56
mid t59 t79 t3 t79 t78 t24 t74 t4
short t51 t56 t16 t2 t4 t66
mid t38 t64 t57 t73 t17 t24 t30
long t65 t20 t60 t28 t4 t11 t15 t37 t67 t21 t73 t12
mid t31 t51 t74 t25 t5 t49 t31 t58 t13 t21
mid t64 t61 t21 t47 t3 t44 t58 t10 t43
short t13 t54 t21
long t7 t40 t0 t26 t72 t11 t74 t4 t68 t59 t48 t30 t49
long t21 t38 t76 t72 t11 t41 t4 t69 t58 t22 t27 t26 t19
mid t77 t66 t69 t24 t59 t21 t32
long t21 t19 t36 t18 t72 t42 t12 t69 t50 t17 t14
mid t66 t48 t64 t27 t40 t34 t33 t72 t75
mid t70 t55 t74 t15 t0 t22 t67 t37 t12
short t48 t57 t37 t37 t56
mid t72 t36 t24 t64 t52 t54 t72
mid t66 t77 t14 t69 t22 t56 t60
mid t77 t59 t65 t9 t67 t7 t29 t41 t66 t14
mid t24 t44 t23 t42 t31 t18 t59 t63
mid t77 t9 t66 t40 t26 t32 t72 t8 t6
short t9 t32 t44 t6 t27
long t40 t63 t61 t1 t56 t38 t65 t72 t43 t17 t52
short t5 t46 t25
long t13 t69 t47 t57 t67 t4 t76 t15 t56 t25 t7 t15 t72 t54 t44
short t42 t48 t53 t75
mid t34 t31 t18 t2 t35 t78 t4 t26 t56
mid t37 t42 t32 t28 t69 t77 t9 t13 t21
short t1 t74 t50 t34 t3 t11
long t45 t35 t41 t21 t67 t3 t22 t42 t8 t27 t65 t21
long t9 t46 t48 t31 t67 t40 t51 t69 t76 t8 t62 t23
mid t33 t31 t2 t77 t68 t6 t43 t57 t75
mid t35 t36 t23 t22 t52 t43 t18 t15
long t23 t0 t64 t6 t67 t72 t60 t52 t14 t10 t51 t16
long t65 t34 t30 t30 t34 t44 t24 t76 t17 t4 t3 t66
short t8 t1 t23 t17
long t34 t9 t35 t46 t57 t14 t77 t29 t2 t40 t58 t32
short t51 t75 t50
mid t72 t12 t51 t70 t74 t37 t2 t69 t39 t64
mid t21 t34 t43 t40 t2 t10 t38 t66 t30 t49
mid t72 t10 t67 t18 t62 t67 t44 t79 t8
mid t40 t22 t42 t3 t20 t56 t27 t42
mid t42 t29 t63 t9 t40 t17 t35
long t41 t12 t54 t47 t50 t5 t20 t64 t59 t21 t74 t2 t4
long t33 t64 t68 t36 t68 t74 t46 t62 t22 t58 t45 t63 t13
long t73 t49 t25 t33 t20 t44 t42 t14 t71 t12 t4 t60 t14 t73 t72
long t6 t29 t21 t26 t66 t47 t66 t66 t7 t31 t19 t59 t50
long t54 t70 t19 t18 t34 t14 t56 t42 t42 t32 t20 t0 t70 t30
short t51 t47 t66 t12 t35
long t13 t10 t15 t70 t41 t47 t38 t3 t55 t42 t19 t29 t5 t13 t5
long t17 t18 t72 t60 t63 t17 t58 t18 t59 t1 t27 t66 t48 t8
short t35 t5 t48 t28 t6
mid t53 t78 t54 t75 t73 t75 t69 t66
long t7 t2 t75 t15 t78 t26 t54 t28 t31 t2 t41 t25 t39 t69
long t47 t45 t14 t67 t46 t66 t14 t39 t68 t1 t5 t24 t23 t74
long t50 t17 t1 t59 t48 t47 t14 t45 t14 t27 t72 t4 t68 t47 t67
long t42 t32 t41 t56 t44 t47 t45 t66 t11 t12 t15
mid t8 t24 t60 t28 t63 t46 t28 t61 t75
long t37 t69 t34 t16 t16 t37 t10 t28 t16 t4 t41 t49 t68 t47 t16
short t73 t32 t79 t58
short t75 t39 t21 t28 t70 t58
mid t77 t49 t21 t60 t55 t17 t22 t14
mid t47 t21 t19 t24 t34 t67 t5 t32 t52 t13
mid t54 t9 t45 t25 t76 t57 t51 t40
long t42 t44 t8 t72 t0 t35 t77 t7 t20 t50 t52 t16 t57
short t41 t76 t4
short t45 t70 t48 t47 t75
mid t15 t18 t36 t37 t27 t16 t51 t1 t79
long t41 t16 t23 t26 t28 t76 t66 t37 t78 t73 t60 t51
mid t36 t35 t53 t43 t45 t75 t67
short t53 t71 t5
mid t7 t46 t20 t45 t61 t32 t59 t15 t0
long t25 t72 t39 t52 t29 t7 t18 t68 t65 t69 t14 t69 t72 t3 t61
long t54 t25 t73 t35 t5 t28 t26 t59 t44 t73 t24 t22 t19 t77
long t12 t32 t55 t64 t79 t68 t65 t53 t48 t21 t47
long t38 t1 t19 t10 t67 t78 t51 t67 t56 t1 t60 t28 t30 t28 t21
mid t20 t48 t43 t40 t73 t4 t14 t59
long t47 t36 t13 t62 t35 t15 t10 t54 t72 t43 t76
long t16 t31 t62 t70 t40 t42 t13 t10 t33 t7 t17 t20 t9
long t7 t21 t56 t52 t46 t20 t59 t20 t20 t18 t59 t57 t10
mid t10 t50 t5 t4 t70 t35 t29 t62 t39
mid t71 t51 t6 t8 t64 t34 t6 t25 t4 t51
long t61 t10 t77 t25 t1 t9 t58 t62 t38 t74 t54 t67 t40 t45 t10
short t40 t47 t59
mid t65 t47 t41 t23 t16 t54 t52 t51 t40
mid t18 t43 t72 t41 t30 t28 t29 t38 t3 t21
mid t10 t3 t48 t12 t17 t72 t49 t62 t76
short t52 t30 t14 t4
long t65 t27 t73 t45 t37 t69 t47 t65 t69 t16 t47 t65
long t12 t75 t41 t15 t42 t55 t5 t23 t24 t31 t76 t13 t3 t49
short t4 t26 t54 t15 t53 t2
short t19 t66 t28 t8 t42
long t65 t33 t22 t41 t29 t64 t3 t78 t8 t12 t6
long t55 t49 t52 t62 t13 t75 t55 t69 t45 t44 t40 t66 t68 t9
mid t41 t66 t15 t74 t11 t38 t72 t29 t70
short t7 t15 t5 t23
mid t26 t8 t2 t61 t9 t59 t59 t47
long t31 t20 t76 t43 t28 t64 t78 t12 t63 t30 t2 t61 t23 t11
long t4 t6 t14 t68 t65 t38 t15 t36 t50 t28 t9 t30 t48 t36 t27
short t34 t3 t52 t58
short t54 t33 t63
short t56 t59 t2 t6 t16
short t62 t15 t14 t73 t6
short t55 t66 t31 t24 t36 t24
long t41 t69 t38 t64 t11 t37 t42 t57 t11 t33 t28 t38 t15 t49
mid t10 t61 t26 t63 t2 t68 t17
mid t45 t50 t49 t38 t23 t50 t19 t75 t46 t29
long t77 t23 t12 t53 t67 t6 t29 t52 t78 t23 t32 t1 t13
long t31 t76 t39 t4 t53 t25 t44 t35 t72 t34 t13 t79
short t71 t1 t62
long t1 t55 t69 t70 t8 t76 t49 t73 t58 t77 t19 t60 t31 t77
long t51 t69 t19 t52 t33 t66 t8 t0 t57 t74 t11 t37 t49
mid t63 t74 t59 t52 t12 t68 t5 t75 t50
mid t74 t3 t0 t72 t2 t26 t14 t48 t48 t74
mid t37 t66 t79 t38 t12 t58 t28 t16 t69 t3
mid t28 t11 t46 t67 t59 t25 t74 t52 t2 t43
mid t15 t19 t38 t36 t32 t27 t65 t33 t63 t22
short t68 t24 t1 t50
short t50 t61 t4
long t32 t65 t77 t2 t56 t13 t62 t9 t2 t75 t71 t42
long t39 t58 t51 t54 t36 t57 t72 t51 t73 t60 t35 t33 t72 t62
mid t60 t50 t25 t76 t3 t52 t15
long t25 t66 t0 t33 t59 t69 t77 t75 t38 t22 t36
short t18 t74 t14 t65 t31
long t68 t76 t47 t59 t12 t42 t79 t3 t34 t5 t69 t42 t51 t54
mid t19 t58 t31 t10 t50 t53 t68
mid t24 t17 t14 t69 t37 t60 t43 t61 t3 t26
long t33 t57 t5 t6 t15 t70 t66 t4 t1 t26 t72
short t43 t40 t2
short t26 t34 t60 t4
long t10 t25 t1 t15 t41 t56 t24 t67 t78 t69 t58
long t36 t75 t76 t44 t43 t65 t19 t62 t40 t45 t22 t9
long t54 t32 t20 t71 t0 t77 t38 t14 t75 t54 t5 t55
short t79 t34 t49 t58 t28
short t44 t8 t42 t58
mid t22 t45 t57 t43 t66 t35 t6 t43 t45 t58
mid t41 t11 t6 t76 t64 t13 t6 t68 t29
mid t43 t72 t32 t2 t58 t63 t46 t57
short t77 t78 t16 t72 t65
short t2 t34 t14
mid t39 t42 t17 t12 t37 t48 t76
long t64 t6 t72 t46 t29 t66 t25 t15 t58 t67 t13 t56 t73 t7
short t36 t22 t41 t32 t15 t21
mid t10 t51 t78 t43 t58 t30 t20 t18 t47 t55
mid t31 t76 t73 t12 t27 t57 t56 t55 t30
mid t77 t0 t20 t21 t58 t11 t73 t7
long t78 t67 t16 t34 t51 t79 t42 t17 t2 t23 t62 t72 t0 t50
long t8 t25 t39 t60 t16 t62 t72 t62 t19 t13 t18 t68 t0 t61
mid t36 t30 t15 t24 t6 t7 t49 t79
long t57 t45 t68 t44 t42 t67 t24 t69 t34 t10 t45 t66 t34
long t37 t69 t31 t36 t10 t61 t65 t27 t9 t22 t10 t62 t64 t46 t9
mid t33 t65 t43 t63 t4 t21 t71 t56 t66
short t53 t35 t54
long t64 t58 t15 t0 t57 t38 t22 t29 t27 t47 t2 t24 t0 t68
long t22 t39 t13 t74 t78 t52 t57 t57 t8 t11 t2 t56 t22
long t34 t27 t24 t55 t2 t43 t65 t52 t58 t71 t76
short t38 t71 t66 t17 t40 t0
short t71 t0 t4 t16 t65 t72
long t1 t56 t9 t30 t8 t19 t52 t71 t18 t78 t23 t2
mid t0 t33 t45 t3 t40 t14 t26
mid t19 t6 t54 t40 t3 t59 t4 t22
mid t77 t44 t22 t63 t48 t62 t12
mid t7 t67 t3 t39 t19 t45 t70 t1 t53
mid t62 t11 t73 t38 t50 t41 t76 t62
long t25 t28 t35 t46 t18 t77 t32 t72 t4 t58 t8 t67 t19
mid t5 t29 t30 t57 t22 t32 t23 t71 t48 t58
mid t49 t11 t42 t42 t5 t12 t42 t45 t76
mid t46 t33 t45 t40 t48 t54 t55 t4 t60
short t35 t48 t57
short t17 t57 t49
long t32 t57 t24 t20 t35 t35 t55 t41 t0 t38 t21 t52 t19 t6
long t79 t4 t78 t24 t31 t57 t61 t75 t40 t61 t68 t67 t46 t55
short t73 t77 t42 t20 t77
long t19 t40 t39 t44 t51 t72 t31 t44 t60 t1 t46 t33 t34 t4
short t75 t69 t79 t12 t9
mid t6 t13 t59 t48 t13 t42 t27
mid t64 t43 t43 t17 t74 t18 t66 t62
mid t55 t59 t10 t26 t68 t53 t22
mid t11 t3 t9 t63 t21 t31 t14 t13 t5 t6
short t65 t60 t51 t46 t7
mid t11 t69 t61 t48 t6 t57 t39 t35 t56
mid t67 t76 t54 t70 t66 t7 t15 t33 t75
short t4 t30 t31
long t39 t12 t64 t28 t22 t27 t50 t69 t43 t12 t15
long t55 t33 t64 t76 t62 t60 t24 t18 t25 t33 t4 t70 t39 t67 t7
mid t76 t49 t51 t52 t70 t59 t57 t2 t77
short t71 t34 t70 t26 t57 t45
mid t6 t30 t47 t54 t21 t0 t16 t8 t61 t72
mid t33 t66 t35 t46 t9 t47 t73
short t19 t5 t21 t52
mid t62 t70 t0 t79 t22 t78 t44 t7 t58 t7
short t37 t58 t46 t66 t51
short t15 t29 t29 t69
long t8 t45 t0 t38 t71 t33 t9 t58 t67 t19 t65 t22 t31
long t54 t4 t43 t22 t49 t19 t72 t66 t66 t40 t60 t64 t60 t46
long t71 t26 t12 t19 t54 t71 t41 t27 t66 t60 t11
long t21 t47 t23 t7 t29 t18 t46 t34 t14 t67 t59 t25
short t45 t1 t41
long t57 t11 t69 t20 t8 t5 t46 t16 t64 t68 t41 t59 t32 t59 t27
short t55 t13 t73
long t18 t46 t68 t4 t31 t33 t71 t24 t32 t11 t29 t24 t76 t72
short t71 t60 t36 t18
long t39 t3 t33 t48 t69 t19 t42 t60 t13 t57 t55 t40 t10 t67 t57
mid t50 t73 t39 t16 t49 t57 t72 t56 t63
long t64 t74 t8 t5 t9 t70 t7 t58 t37 t12 t7 t65
short t23 t49 t71 t77
short t6 t45 t17 t69 t17
short t75 t28 t19
mid t25 t22 t50 t37 t8 t31 t26 t57 t64 t71
mid t35 t9 t79 t58 t58 t61 t9
mid t66 t52 t73 t79 t47 t49 t7 t68 t2 t73
long t3 t26 t39 t60 t33 t51 t0 t3 t17 t34 t77 t39 t45
mid t69 t59 t8 t77 t2 t72 t76 t13 t17
mid t55 t77 t38 t46 t30 t3 t58 t64 t26
long t44 t9 t55 t28 t16 t48 t23 t18 t28 t5 t36 t36 t72
short t78 t79 t13 t56 t0 t47
mid t73 t79 t66 t46 t29 t30 t78
short t28 t25 t54 t2 t7
long t58 t70 t32 t60 t53 t9 t31 t60 t69 t28 t60 t4 t30
mid t22 t55 t73 t64 t33 t42 t72 t68 t78 t24
short t44 t31 t71
short t1 t42 t65 t2
long t20 t73 t19 t37 t32 t4 t53 t6 t40 t49 t31 t28 t6 t28
mid t12 t40 t31 t62 t74 t77 t63 t13 t54 t5
short t54 t20 t23 t43 t50
long t51 t22 t51 t67 t27 t5 t3 t1 t25 t66 t27 t27 t41 t44 t4
long t4 t24 t30 t29 t18 t79 t58 t71 t45 t68 t53 t4 t35 t64
long t3 t10 t56 t68 t3 t51 t65 t38 t29 t11 t37 t74
long t5 t20 t31 t11 t55 t0 t69 t37 t52 t76 t25
mid t56 t0 t1 t62 t22 t40 t7 t55 t78
short t36 t76 t7 t18
long t27 t45 t21 t47 t6 t26 t18 t44 t60 t18 t46
short t67 t67 t18 t55
short t19 t42 t70 t1 t34 t53
short t75 t18 t78
long t76 t75 t33 t52 t6 t45 t56 t17 t76 t42 t40 t2 t38 t9 t23
long t67 t50 t13 t43 t44 t64 t25 t54 t8 t78 t61 t13 t71
long t72 t77 t57 t58 t45 t13 t2 t14 t3 t74 t76 t7 t26
mid t7 t21 t40 t44 t6 t51 t64 t17
short t58 t5 t16
mid t6 t7 t34 t14 t74 t27 t73 t28 t8 t50
mid t76 t61 t43 t67 t34 t65 t53 t74
short t37 t49 t24 t2
short t46 t60 t52 t59 t55
mid t8 t28 t60 t7 t30 t63 t28 t65
mid t1 t6 t26 t74 t16 t30 t56 t60 t62
mid t45 t9 t0 t20 t56 t34 t59
mid t59 t12 t39 t25 t20 t39 t33 t20 t52
mid t44 t52 t22 t29 t25 t20 t3
mid t6 t26 t0 t51 t58 t3 t50
long t37 t31 t48 t11 t78 t50 t25 t59 t65 t7 t57
mid t45 t36 t51 t44 t53 t3 t3 t39
mid t4 t69 t67 t12 t33 t14 t47 t33
long t61 t42 t55 t30 t39 t37 t9 t54 t56 t66 t47 t72 t15
long t31 t26 t2 t16 t70 t76 t25 t64 t52 t5 t4 t3
short t28 t22 t2 t75 t52
short t48 t10 t24 t52 t67 t23
mid t37 t48 t24 t37 t69 t60 t34 t75 t19
long t71 t60 t37 t67 t67 t42 t36 t38 t73 t38 t30 t73 t66
short t69 t3 t11
long t20 t73 t66 t27 t69 t63 t27 t67 t16 t8 t35 t15 t13 t13 t64
mid t77 t71 t77 t33 t30 t22 t34 t4 t24
short t67 t48 t28
long t53 t44 t41 t40 t48 t9 t46 t25 t25 t59 t50 t33 t15 t21 t48
long t45 t8 t18 t17 t19 t1 t64 t0 t41 t71 t72 t48 t65 t35 t38
long t69 t38 t54 t34 t51 t20 t31 t28 t8 t78 t27 t8 t60 t58
short t49 t71 t51 t6
short t55 t6 t63
long t49 t34 t64 t45 t40 t6 t75 t48 t10 t60 t65 t20 t28 t66 t21
short t75 t15 t3 t10 t5 t27
long t37 t63 t57 t5 t13 t33 t78 t23 t14 t79 t31 t26
long t63 t60 t18 t59 t21 t75 t47 t28 t78 t13 t9 t11
long t21 t12 t63 t47 t30 t19 t33 t42 t64 t76 t31 t46 t78
mid t42 t25 t29 t70 t56 t16 t30 t20 t45 t54
long t31 t42 t48 t76 t15 t61 t15 t58 t62 t31 t67 t55
mid t17 t70 t40 t25 t48 t2 t73 t37 t69 t74
short t49 t38 t20
long t75 t44 t8 t66 t10 t48 t37 t40 t18 t26 t2 t38
mid t0 t4 t67 t47 t47 t62 t77 t6 t27 t14
long t17 t73 t12 t23 t46 t30 t51 t67 t30 t4 t21 t21 t9 t50 t19
mid t40 t59 t77 t14 t39 t43 t50 t57 t53
long t37 t51 t30 t58 t32 t44 t61 t4 t23 t67 t6 t44 t70 t77 t22
short t16 t9 t5 t37
mid t42 t36 t75 t19 t19 t13 t57 t17 t74 t75
long t25 t16 t56 t69 t0 t16 t1 t32 t18 t29 t53 t29 t67 t26 t75
long t37 t56 t10 t76 t66 t18 t2 t11 t42 t8 t15 t56 t70
mid t3 t70 t67 t50 t22 t29 t69 t52
short t26 t68 t49 t55
mid t6 t15 t18 t21 t69 t4 t1
mid t72 t75 t59 t73 t70 t36 t78
mid t50 t62 t11 t16 t53 t71 t6 t0
short t42 t39 t63
mid t70 t40 t36 t45 t37 t44 t26
long t38 t30 t64 t33 t43 t43 t67 t22 t65 t64 t13 t34 t48
mid t39 t18 t6 t0 t63 t4 t18
long t63 t48 t30 t62 t70 t71 t4 t7 t12 t18 t56 t78 t49 t64
long t16 t40 t9 t22 t73 t13 t19 t12 t36 t70 t30 t47
long t55 t24 t30 t55 t26 t64 t49 t15 t3 t57 t70 t11 t77 t5
long t13 t54 t27 t29 t62 t71 t46 t67 t62 t16 t79
short t55 t63 t4
short t37 t40 t78 t18
mid t28 t8 t10 t8 t71 t41 t79
short t79 t52 t55 t12 t16 t56
mid t79 t15 t22 t50 t28 t32 t42 t54 t1
mid t30 t14 t14 t54 t15 t65 t4 t21 t28 t16
long t63 t31 t56 t28 t74 t72 t66 t41 t71 t26 t22
long t67 t40 t68 t78 t63 t25 t64 t26 t52 t75 t14 t48 t77
mid t22 t43 t63 t72 t7 t28 t19 t2 t25
short t75 t27 t9 t78
short t78 t5 t27 t51 t22 t79
long t61 t47 t51 t57 t57 t59 t56 t16 t7 t61 t79
mid t37 t40 t11 t6 t18 t32 t39 t72 t75
short t30 t63 t64 t26 t74
long t76 t19 t49 t43 t35 t57 t50 t54 t39 t29 t62
mid t47 t72 t27 t24 t36 t15 t19 t30 t70 t32
short t13 t10 t24 t78
short t40 t9 t11 t32 t27 t57
mid t67 t33 t19 t29 t59 t65 t67 t30
long t0 t75 t13 t44 t63 t62 t6 t15 t73 t78 t20
long t32 t77 t47 t3 t5 t64 t59 t76 t71 t27 t52 t36 t32 t37
short t7 t75 t20 t7
short t49 t6 t48 t3 t37 t34
mid t66 t73 t50 t47 t78 t66 t76
long t47 t15 t12 t54 t5 t20 t42 t3 t0 t1 t15 t39 t7
mid t14 t8 t8 t60 t54 t44 t59 t42 t42
mid t30 t26 t34 t45 t42 t11 t60 t64
mid t36 t57 t20 t29 t60 t15 t76
short t25 t5 t9
short t79 t53 t32
short t36 t57 t32
short t5 t7 t36 t19 t34 t69
long t64 t59 t7 t35 t47 t60 t60 t57 t59 t65 t22 t15 t31 t33
short t54 t40 t47 t37
long t56 t60 t28 t16 t0 t77 t66 t59 t49 t21 t68 t78
short t25 t18 t78 t5 t39 t55
mid t60 t53 t42 t6 t35 t23 t21
mid t22 t9 t0 t54 t35 t32 t78 t6 t67 t40
short t39 t22 t52
mid t73 t62 t72 t43 t5 t68 t65 t6 t66
long t27 t51 t71 t14 t18 t25 t79 t30 t73 t35 t23 t2
short t31 t27 t43
mid t3 t15 t61 t78 t25 t6 t12
mid t54 t65 t18 t71 t63 t2 t55
long t8 t3 t36 t40 t15 t51 t30 t63 t45 t39 t2 t76 t60
long t21 t20 t45 t66 t51 t71 t14 t53 t60 t32 t15 t17 t17
mid t1 t19 t28 t16 t19 t41 t0 t37
mid t29 t6 t11 t64 t62 t34 t14 t64 t54
mid t14 t12 t36 t45 t3 t25 t70 t60 t43 t12
long t16 t18 t2 t40 t17 t19 t51 t32 t65 t38 t76 t4 t72
mid t6 t39 t52 t22 t64 t68 t63 t40 t14
long t3 t12 t64 t30 t13 t38 t76 t16 t40 t31 t56 t28 t38 t24 t39
mid t48 t51 t63 t30 t3 t17 t26 t74 t71
mid t67 t44 t69 t16 t35 t19 t65 t14 t20 t46
long t15 t65 t57 t60 t12 t43 t15 t47 t4 t57 t47 t4 t30
short t38 t19 t16 t54
long t76 t46 t4 t35 t19 t10 t23 t28 t47 t70 t5 t32
short t54 t35 t7 t60 t24 t35
mid t71 t30 t12 t70 t71 t75 t34 t52 t5
short t27 t13 t21
mid t10 t63 t47 t57 t39 t6 t67 t62 t72
long t76 t76 t27 t76 t9 t65 t73 t71 t65 t38 t0 t24
long t2 t53 t46 t38 t65 t18 t64 t52 t14 t46 t36 t18
mid t46 t5 t65 t23 t6 t4 t10
long t56 t9 t20 t35 t75 t25 t7 t42 t15 t13 t41 t71 t44 t75 t17
long t21 t9 t60 t32 t53 t36 t8 t70 t24 t21 t62 t54 t40 t10 t48
long t60 t74 t65 t41 t39 t38 t31 t36 t61 t49 t64 t70 t20
long t8 t20 t58 t23 t5 t21 t68 t61 t37 t56 t35
short t14 t40 t49 t9 t1 t8
short t24 t66 t69 t65 t36
mid t21 t10 t25 t41 t54 t76 t77
long t19 t12 t68 t31 t25 t31 t64 t60 t9 t5 t0 t12 t46 t27
long t29 t56 t4 t16 t66 t52 t67 t22 t13 t71 t30 t70
long t67 t19 t50 t6 t0 t41 t71 t60 t68 t55 t8 t30
mid t16 t3 t46 t77 t64 t10 t50 t58 t0 t32
mid t54 t0 t56 t77 t23 t18 t48 t72 t64
long t4 t15 t79 t78 t61 t24 t57 t22 t61 t45 t25 t48 t40
mid t31 t9 t33 t59 t65 t0 t14 t67 t30 t71
mid t25 t4 t53 t7 t21 t23 t61 t36
mid t51 t39 t13 t43 t58 t31 t2 t22 t50 t44
short t43 t1 t46
long t50 t56 t72 t10 t65 t19 t28 t17 t76 t53 t23
short t47 t74 t10 t12 t41 t1
mid t22 t24 t22 t49 t57 t53 t44 t39 t40
short t75 t3 t64 t55 t33
mid t37 t36 t37 t12 t40 t35 t76 t27 t35 t67
short t36 t76 t16 t77 t66
long t78 t28 t46 t27 t34 t51 t10 t47 t48 t13 t40 t36 t11
long t78 t70 t17 t56 t4 t5 t14 t11 t50 t10 t31
mid t77 t66 t34 t43 t63 t37 t47 t10
mid t40 t72 t1 t45 t23 t71 t55 t18
long t42 t13 t63 t17 t71 t78 t0 t10 t10 t37 t17 t32
short t45 t20 t44 t69 t74
short t78 t49 t74 t70 t17
mid t20 t10 t0 t6 t76 t44 t76
long t61 t29 t23 t3 t18 t77 t49 t4 t66 t25 t4 t76 t45 t61 t24
long t69 t18 t48 t29 t64 t55 t2 t50 t63 t53 t9 t24 t31 t40 t33
long t70 t17 t4 t79 t54 t28 t71 t26 t65 t50 t29 t56
long t48 t38 t34 t24 t39 t79 t68 t52 t55 t62 t10 t12 t41 t9
mid t29 t71 t44 t37 t78 t39 t77 t74 t18 t67
mid t75 t61 t9 t79 t7 t38 t13 t5 t24
short t79 t18 t64
short t47 t72 t63 t6
long t13 t56 t67 t48 t58 t16 t62 t16 t57 t34 t9
long t47 t73 t35 t18 t72 t67 t8 t52 t44 t11 t65 t6
mid t54 t75 t25 t50 t51 t66 t79
short t17 t39 t48 t69 t1 t69
long t52 t64 t60 t52 t75 t37 t28 t53 t41 t51 t34
long t21 t38 t31 t39 t79 t50 t22 t11 t26 t44 t75 t77 t15 t71 t32
long t19 t65 t19 t30 t20 t60 t44 t22 t78 t46 t34 t41 t44 t39
short t17 t51 t37 t32 t42 t43
long t0 t11 t0 t27 t71 t74 t19 t8 t6 t57 t26 t49 t27 t78
long t9 t64 t28 t24 t35 t33 t11 t74 t46 t69 t24
long t59 t66 t79 t51 t70 t30 t20 t77 t32 t75 t26 t73 t5
long t17 t52 t72 t7 t41 t37 t11 t72 t73 t56 t34 t64 t32 t26
mid t59 t52 t30 t32 t50 t61 t52 t30
mid t31 t27 t66 t50 t68 t73 t20 t36
short t5 t21 t37 t16 t72
mid t42 t17 t36 t75 t27 t42 t29 t4 t70 t39
mid t41 t71 t7 t74 t64 t6 t67 t51 t44
mid t31 t30 t69 t40 t76 t8 t42 t41
short t71 t39 t38 t56 t48 t52
mid t76 t30 t4 t40 t60 t49 t24 t61 t34
long t31 t4 t8 t78 t37 t42 t70 t38 t79 t18 t36 t11
mid t32 t60 t74 t69 t30 t78 t18 t25
short t11 t61 t75
long t23 t25 t31 t74 t68 t65 t75 t14 t58 t46 t26 t47 t58 t27
long t17 t28 t56 t47 t64 t5 t17 t18 t41 t17 t61 t34 t28 t51 t40
long t71 t17 t6 t71 t76 t16 t18 t68 t37 t22 t72 t38
mid t2 t1 t9 t8 t29 t19 t24 t32 t53
long t68 t79 t61 t25 t34 t0 t59 t36 t59 t61 t19
mid t20 t79 t9 t70 t74 t22 t53 t64 t10 t11
long t78 t18 t31 t66 t34 t24 t32 t3 t71 t15 t79 t11
long t55 t35 t63 t32 t18 t37 t4 t21 t68 t42 t71 t79
short t46 t36 t41 t53 t49
mid t16 t42 t26 t15 t48 t37 t68 t65
short t7 t54 t21 t23
mid t51 t59 t63 t48 t16 t68 t46 t57 t64
short t16 t60 t33
long t22 t42 t25 t58 t43 t35 t26 t18 t21 t56 t57 t74
mid t15 t12 t11 t40 t26 t23 t70
short t63 t62 t75 t10
short t37 t30 t63
mid t2 t37 t64 t57 t47 t5 t64 t33 t27 t5
mid t70 t75 t36 t54 t39 t46 t14
mid t39 t49 t46 t32 t73 t38 t48 t22
short t20 t44 t74
long t12 t62 t51 t9 t73 t7 t44 t22 t59 t75 t28 t32
short t76 t31 t79
long t17 t3 t4 t70 t18 t65 t11 t27 t20 t77 t71 t72 t8 t51
long t65 t65 t71 t34 t37 t29 t66 t57 t29 t79 t3
short t57 t53 t6 t40
long t19 t10 t23 t19 t58 t47 t47 t24 t37 t45 t2 t41
mid t20 t4 t4 t44 t75 t75 t44 t45
short t29 t18 t43 t56
short t18 t11 t16
short t74 t16 t30
short t62 t6 t72 t12 t73 t63
long t69 t48 t29 t26 t3 t4 t50 t27 t60 t36 t72
short t1 t12 t9 t79
mid t52 t21 t43 t44 t75 t26 t32 t68 t18 t44
mid t51 t46 t47 t3 t33 t75 t13 t67 t55 t35
long t62 t68 t51 t59 t79 t26 t50 t18 t60 t56 t50 t30 t32
long t53 t41 t26 t43 t13 t16 t19 t50 t57 t14 t9 t22 t2
mid t26 t69 t21 t8 t47 t55 t66 t35
short t10 t15 t23 t62 t12
long t16 t0 t69 t42 t58 t46 t25 t66 t66 t11 t65 t47 t16
mid t17 t54 t31 t25 t50 t41 t41 t41 t2
short t62 t52 t20 t38 t12
mid t66 t77 t28 t53 t14 t73 t41 t13
short t49 t8 t32 t47 t33 t69
long t29 t69 t59 t42 t56 t66 t37 t34 t79 t8 t42
short t31 t3 t15 t70 t2 t29
long t79 t54 t9 t18 t15 t74 t30 t45 t67 t8 t25 t73 t14 t65
long t21 t52 t75 t13 t14 t70 t64 t64 t7 t60 t76 t36 t41 t62 t8
mid t64 t13 t3 t40 t32 t35 t77 t73 t78 t41
short t27 t23 t14 t62 t65 t49
short t37 t37 t0 t16 t1
long t14 t24 t1 t27 t68 t1 t10 t47 t70 t7 t19 t16 t19 t23
long t71 t52 t26 t6 t63 t1 t47 t6 t47 t63 t59 t59 t44
mid t72 t15 t57 t26 t41 t63 t14
mid t44 t25 t34 t71 t32 t67 t18 t16 t41 t23
short t5 t46 t36 t55 t76
mid t51 t22 t22 t77 t38 t3 t27 t60
short t52 t17 t29 t4 t42
long t0 t39 t38 t51 t32 t30 t61 t57 t52 t7 t79
long t71 t9 t25 t17 t49 t45 t1 t17 t56 t51 t73 t68 t79 t46
long t43 t72 t40 t60 t8 t64 t49 t57 t42 t23 t36 t69 t49 t51
mid t39 t17 t70 t11 t36 t22 t37 t0 t49 t1
long t54 t60 t55 t24 t73 t11 t37 t20 t5 t19 t72
mid t61 t45 t17 t5 t43 t42 t22 t61 t53
mid t8 t16 t42 t17 t68 t31 t39
mid t36 t48 t62 t26 t1 t2 t3 t34
short t39 t3 t28
long t35 t59 t68 t32 t19 t27 t39 t75 t23 t45 t18 t3 t60 t66 t2
long t62 t17 t49 t35 t26 t23 t38 t58 t75 t38 t14
short t48 t73 t18 t5
long t20 t27 t52 t36 t69 t57 t74 t34 t25 t18 t68 t74
short t43 t36 t58 t52 t21 t56
long t26 t17 t74 t16 t50 t79 t21 t58 t20 t3 t61 t24 t75
mid t18 t40 t69 t49 t52 t5 t76
mid t20 t76 t40 t5 t73 t66 t57
long t67 t51 t78 t14 t24 t33 t68 t52 t39 t12 t15 t64
long t74 t29 t42 t39 t34 t20 t71 t32 t64 t14 t17
mid t3 t73 t77 t45 t37 t24 t24 t75 t51
long t34 t77 t41 t36 t66 t65 t22 t71 t27 t12 t53 t27 t66 t55
long t68 t44 t58 t24 t1 t34 t72 t55 t66 t14 t79 t70
long t42 t55 t7 t49 t39 t26 t14 t0 t32 t61 t60 t78 t34 t44 t56
long t48 t10 t32 t21 t73 t76 t61 t70 t66 t24 t70
mid t19 t44 t35 t37 t71 t5 t49 t19
mid t19 t24 t46 t45 t64 t66 t71
long t23 t78 t60 t43 t15 t65 t3 t47 t1 t27 t20 t62
short t69 t36 t58 t0 t5
long t45 t50 t45 t15 t64 t63 t28 t16 t60 t51 t70 t33 t46 t78 t14
long t0 t67 t45 t57 t50 t26 t38 t58 t53 t16 t18 t60 t5 t70 t3
long t33 t64 t30 t54 t14 t49 t53 t25 t27 t24 t67
long t37 t8 t72 t9 t54 t2 t73 t75 t66 t63 t51 t64 t15
short t66 t57 t60 t60 t37
mid t18 t50 t24 t20 t78 t63 t6 t63 t14
short t62 t40 t49 t74
long t75 t29 t27 t0 t20 t29 t16 t17 t15 t30 t76 t4 t65 t45
mid t13 t6 t5 t69 t49 t69 t30 t72 t53
long t51 t74 t28 t74 t62 t53 t22 t42 t72 t3 t24 t1 t0
long t38 t8 t41 t30 t61 t22 t10 t21 t31 t24 t20 t19 t25
short t72 t36 t22 t14 t67 t57
mid t28 t39 t29 t25 t2 t39 t30 t17 t37
long t44 t0 t53 t16 t8 t63 t60 t26 t9 t6 t12 t51 t0 t7
long t18 t64 t21 t55 t50 t56 t17 t23 t24 t77 t37 t23 t61 t64 t14
long t4 t28 t77 t13 t66 t67 t67 t76 t9 t7 t17
mid t54 t24 t58 t19 t67 t61 t60
mid t20 t11 t26 t62 t53 t5 t71 t69 t32 t30
mid t44 t79 t69 t4 t6 t35 t66 t57
short t42 t19 t20
long t76 t55 t17 t32 t3 t65 t44 t45 t53 t53 t50 t15 t44
mid t5 t58 t62 t50 t19 t6 t52
long t72 t2 t54 t12 t33 t40 t51 t35 t35 t12 t46 t79 t21 t51 t63
short t17 t40 t67 t15 t11
short t79 t12 t71 t31 t38
short t75 t73 t37 t7
short t61 t19 t22 t11 t54 t54
mid t38 t1 t1 t33 t71 t21 t24 t55 t30 t1
mid t35 t68 t53 t17 t77 t70 t8 t65 t71
mid t13 t6 t54 t77 t12 t35 t73 t54
mid t42 t34 t37 t39 t63 t5 t22 t54 t14
short t30 t24 t62 t29 t12 t64
short t17 t15 t20 t70 t37
long t6 t9 t15 t52 t72 t15 t0 t51 t25 t9 t46
mid t73 t64 t75 t40 t38 t28 t55 t76 t25
long t36 t55 t75 t17 t30 t59 t46 t33 t62 t51 t51 t58
short t0 t18 t23 t58 t72
long t61 t1 t14 t13 t77 t72 t44 t44 t67 t1 t60 t35 t72 t24 t28
long t10 t51 t58 t22 t18 t17 t7 t68 t64 t23 t4 t6 t41
long t12 t8 t9 t34 t8 t66 t21 t11 t19 t56 t17 t15 t52 t15 t40
mid t2 t0 t57 t54 t68 t30 t65 t60 t0
short t44 t51 t78 t58
mid t11 t77 t32 t38 t38 t41 t56 t74
short t71 t0 t45 t73
mid t4 t32 t3 t30 t52 t21 t76 t32
mid t43 t50 t21 t43 t53 t3 t21 t47 t2 t57
long t66 t40 t67 t14 t14 t12 t14 t79 t0 t69 t63 t6 t14 t31
mid t70 t52 t71 t68 t57 t65 t59 t64 t76
long t46 t62 t4 t21 t25 t73 t44 t17 t17 t54 t57 t58 t75 t58
short t20 t48 t23
mid t37 t66 t18 t13 t47 t65 t48
mid t12 t27 t6 t54 t4 t58 t8 t55
long t4 t20 t35 t48 t43 t54 t42 t41 t12 t13 t42 t62 t9
short t36 t13 t72 t59 t17 t36
short t56 t3 t34 t65
short t77 t48 t0 t43 t35
mid t79 t35 t58 t22 t34 t76 t51 t13 t6
long t37 t6 t47 t58 t40 t2 t43 t70 t73 t36 t3 t50
long t14 t32 t26 t25 t12 t38 t16 t39 t13 t40 t46 t62 t19
mid t8 t40 t69 t51 t73 t17 t6
long t76 t77 t28 t8 t14 t0 t58 t26 t35 t67 t64 t46 t25
long t61 t48 t45 t42 t6 t36 t60 t71 t41 t35 t39 t18 t59 t27 t70
short t17 t48 t56 t32 t22 t60
mid t25 t19 t60 t42 t15 t1 t40 t54
mid t56 t26 t46 t33 t30 t49 t72 t4 t5
short t42 t12 t27 t2 t12 t1
long t16 t46 t78 t63 t7 t61 t0 t61 t72 t46 t77 t15 t17 t27 t28
short t63 t75 t38 t4
long t49 t33 t24 t73 t20 t55 t15 t11 t27 t43 t34 t74 t42
long t75 t9 t31 t25 t56 t53 t57 t14 t35 t46 t2
short t62 t59 t79
mid t67 t0 t9 t51 t75 t13 t65 t22 t28
mid t21 t40 t56 t65 t70 t54 t64
long t53 t37 t53 t65 t0 t4 t74 t6 t76 t22 t51 t49 t44 t2
mid t73 t9 t11 t26 t14 t75 t60 t65 t56
short t11 t51 t32 t73 t35 t42
long t15 t74 t13 t6 t30 t10 t39 t58 t15 t30 t66 t23
mid t17 t12 t36 t62 t75 t25 t5 t53
short t46 t48 t9 t40 t62
short t19 t45 t45
short t9 t63 t27 t58
long t26 t22 t44 t62 t14 t20 t37 t68 t21 t10 t19 t6 t44 t75
short t8 t32 t43 t72
long t33 t5 t15 t57 t11 t18 t79 t22 t26 t64 t24
mid t44 t67 t17 t54 t22 t42 t36 t42 t22 t8
long t46 t48 t32 t18 t78 t0 t40 t57 t5 t50 t3 t78 t19 t57 t63
long t49 t75 t19 t6 t42 t35 t59 t66 t53 t57 t4 t72 t13 t43 t26
short t72 t34 t29
mid t24 t8 t2 t72 t79 t9 t59
long t50 t29 t7 t74 t21 t11 t56 t20 t8 t61 t72 t61 t54
short t67 t2 t36 t40 t1 t13
long t67 t9 t23 t74 t16 t77 t24 t34 t23 t26 t34 t43 t39
long t16 t31 t45 t61 t38 t34 t9 t63 t56 t79 t72 t62 t73
short t6 t51 t55
short t21 t79 t69 t15 t71 t1
long t28 t38 t63 t21 t30 t28 t51 t53 t26 t23 t22 t21 t79 t45 t61
mid t20 t34 t62 t59 t40 t13 t72 t18 t68
mid t51 t27 t54 t27 t6 t33 t22 t28 t40
short t13 t9 t24 t69 t40 t1
short t42 t70 t6 t79 t49 t25
mid t51 t34 t30 t26 t0 t5 t56 t48 t47
short t59 t20 t56 t31
mid t70 t10 t70 t20 t10 t41 t66
short t60 t9 t32
long t17 t26 t72 t71 t58 t2 t49 t47 t5 t56 t58 t26 t76 t38
mid t47 t31 t77 t0 t37 t30 t44 t10
short t29 t21 t30 t77 t10
long t48 t43 t65 t60 t7 t45 t77 t18 t76 t63 t17
short t65 t69 t25 t77 t48 t37
long t24 t40 t55 t45 t61 t44 t13 t48 t69 t57 t45 t65 t43 t12 t25
mid t40 t33 t48 t25 t8 t41 t36 t11
mid t10 t26 t76 t19 t30 t35 t18 t73
short t66 t36 t68 t27 t0 t49
long t67 t8 t16 t2 t71 t54 t14 t59 t43 t50 t18 t68 t52 t75
long t27 t18 t71 t53 t39 t72 t24 t25 t12 t7 t24 t67 t59 t6
short t41 t32 t20 t32
mid t71 t55 t39 t52 t3 t53 t26
long t21 t31 t18 t26 t19 t1 t44 t42 t22 t77 t72 t13 t56 t37
short t66 t12 t5 t61 t73
short t5 t77 t20
long t5 t8 t47 t38 t7 t39 t69 t17 t67 t49 t65 t15 t78
short t54 t8 t66 t20
long t76 t47 t9 t46 t55 t7 t0 t65 t19 t65 t24 t77 t66 t20
mid t64 t10 t11 t15 t59 t22 t23
long t47 t70 t71 t18 t5 t8 t53 t19 t49 t49 t41 t12 t24
long t30 t4 t37 t43 t65 t37 t77 t59 t68 t76 t75 t77 t0 t47 t65
short t13 t39 t66 t4
mid t32 t38 t38 t41 t30 t12 t63
long t9 t73 t4 t33 t59 t64 t60 t44 t9 t43 t40 t44 t29 t50
mid t42 t63 t44 t29 t60 t71 t66 t21 t68 t61
short t23 t12 t29
short t69 t4 t69
short t50 t33 t5 t42
mid t61 t16 t40 t22 t26 t70 t53
long t47 t26 t39 t77 t20 t17 t41 t70 t59 t24 t23 t57 t32 t45
short t63 t3 t73 t28 t34 t55
long t37 t16 t75 t51 t64 t77 t12 t78 t1 t7 t12
short t10 t12 t27 t50 t15
long t36 t78 t33 t41 t76 t71 t0 t26 t51 t21 t42
long t4 t34 t63 t30 t11 t37 t29 t6 t32 t41 t27 t61
mid t72 t31 t73 t22 t25 t42 t23
mid t73 t72 t46 t11 t39 t62 t79 t28
long t18 t15 t63 t24 t22 t40 t75 t13 t37 t48 t72
long t61 t61 t5 t54 t52 t23 t27 t38 t56 t71 t14 t30 t52
short t67 t63 t69
mid t24 t47 t25 t13 t11 t74 t23 t59 t43
short t36 t71 t57 t51 t4
mid t17 t60 t50 t53 t49 t38 t10 t63
short t37 t32 t68 t31 t71
mid t41 t31 t31 t42 t14 t30 t21 t15
mid t29 t6 t13 t2 t48 t29 t66 t79 t66
short t30 t49 t52 t73 t14
long t6 t69 t18 t58 t35 t66 t34 t49 t73 t31 t45
long t0 t9 t11 t41 t75 t71 t42 t32 t51 t45 t12 t68 t25 t1
short t12 t20 t24 t72 t65
long t46 t26 t67 t3 t0 t1 t48 t42 t75 t21 t39
mid t63 t26 t54 t50 t70 t40 t43 t2 t59 t6
long t77 t62 t2 t24 t61 t75 t3 t53 t20 t21 t30
mid t9 t20 t57 t11 t16 t29 t78 t57 t40 t49
long t8 t43 t4 t60 t69 t64 t2 t32 t53 t19 t36 t53 t54 t34
long t67 t32 t68 t14 t11 t32 t17 t44 t56 t48 t32 t46
short t39 t40 t63
long t55 t60 t44 t19 t21 t72 t44 t39 t25 t39 t8 t11
mid t6 t61 t48 t1 t41 t46 t34 t60 t72
long t71 t40 t60 t36 t3 t20 t61 t57 t79 t22 t17 t15 t4 t33
long t50 t11 t68 t50 t3 t19 t16 t51 t23 t63 t2
mid t24 t38 t2 t0 t14 t17 t76 t32 t22 t10
long t0 t56 t17 t73 t12 t41 t19 t46 t23 t6 t70 t23
mid t9 t2 t48 t26 t35 t71 t24 t46
long t40 t14 t26 t73 t60 t70 t4 t59 t1 t40 t37 t11 t56
long t67 t40 t44 t55 t72 t57 t12 t14 t37 t7 t61 t57 t39 t51
long t17 t21 t73 t29 t31 t10 t10 t37 t50 t71 t6 t77 t70 t5
short t21 t78 t39 t42 t44 t19
long t57 t38 t43 t32 t72 t39 t37 t47 t41 t19 t60 t11
long t33 t57 t32 t38 t40 t14 t35 t67 t30 t58 t51 t69
long t59 t0 t1 t13 t26 t42 t71 t35 t46 t31 t42 t77
mid t22 t76 t29 t43 t8 t16 t4 t4 t54
mid t10 t34 t56 t32 t51 t51 t9 t68
mid t9 t2 t54 t73 t27 t41 t56 t63 t5
long t42 t14 t62 t58 t72 t39 t32 t77 t52 t29 t65
long t11 t48 t28 t17 t71 t58 t75 t1 t42 t29 t74 t14 t63 t22 t5
long t55 t9 t30 t2 t8 t4 t30 t19 t42 t12 t55 t24 t38 t55 t36
long t46 t36 t47 t1 t60 t70 t73 t24 t56 t31 t15 t20 t34
mid t59 t2 t28 t9 t60 t16 t24 t53 t74
short t58 t64 t6 t59
long t55 t14 t35 t39 t54 t79 t25 t25 t7 t39 t43 t8 t64 t3 t8
long t31 t18 t24 t4 t3 t15 t74 t68 t76 t13 t32 t18 t6 t28
long t46 t5 t68 t9 t54 t72 t64 t33 t72 t67 t0 t22
long t23 t75 t53 t66 t28 t23 t73 t13 t7 t35 t26 t14
mid t25 t38 t18 t49 t32 t68 t68 t48
mid t76 t19 t8 t54 t13 t31 t33
mid t62 t78 t59 t58 t55 t1 t63 t3 t53 t23
long t5 t69 t1 t20 t53 t59 t12 t40 t51 t22 t21 t29 t21 t43
short t19 t49 t21 t2 t7 t1
mid t32 t8 t64 t2 t64 t4 t72
long t53 t76 t78 t56 t63 t32 t48 t71 t19 t50 t38 t4 t27 t54 t36
mid t77 t28 t28 t3 t64 t52 t43
long t31 t27 t79 t55 t17 t44 t10 t44 t31 t4 t70 t69 t37 t29 t75
short t45 t6 t46 t0 t24 t25
mid t57 t53 t43 t32 t62 t62 t28
long t38 t64 t30 t28 t46 t44 t60 t31 t61 t33 t18 t26 t63 t18 t4
long t21 t70 t74 t21 t78 t24 t28 t23 t34 t28 t19 t70 t60 t75 t58
mid t56 t71 t4 t53 t79 t64 t38 t77 t75 t11
long t32 t59 t46 t8 t5 t5 t41 t60 t74 t49 t61
mid t13 t11 t42 t46 t6 t36 t16 t77
short t57 t34 t75 t42
short t42 t79 t59
long t62 t60 t27 t4 t70 t9 t76 t10 t67 t41 t53 t69 t51 t74 t54
short t15 t47 t76 t37
mid t61 t25 t79 t65 t56 t57 t17
short t78 t78 t22
short t24 t34 t59 t6
mid t44 t0 t57 t65 t0 t5 t9 t35 t7
long t74 t48 t25 t54 t52 t14 t18 t55 t46 t76 t37
short t66 t37 t40 t42 t79
short t26 t38 t3 t40
long t8 t39 t28 t74 t26 t3 t21 t76 t37 t68 t47
mid t17 t8 t76 t20 t63 t71 t28 t18 t55
mid t6 t3 t36 t59 t71 t35 t72
long t53 t1 t74 t50 t62 t41 t29 t44 t2 t43 t32 t45 t64
mid t32 t20 t22 t44 t33 t65 t43
long t34 t20 t58 t10 t77 t76 t16 t62 t67 t74 t47
short t11 t14 t12 t22
long t38 t64 t7 t52 t51 t13 t47 t55 t43 t4 t12
short t2 t3 t53
long t5 t44 t34 t18 t70 t13 t38 t73 t24 t16 t2 t32 t38 t22 t50
mid t50 t49 t40 t77 t76 t65 t63 t53 t57
long t60 t41 t43 t14 t13 t59 t30 t14 t38 t65 t69 t24 t54 t75
long t17 t68 t19 t27 t50 t74 t23 t34 t56 t57 t64
long t71 t43 t48 t54 t45 t50 t35 t37 t7 t2 t19 t30
long t34 t8 t34 t38 t66 t55 t58 t23 t49 t65 t2
short t24 t12 t56 t9 t71
long t40 t18 t17 t43 t13 t47 t73 t10 t3 t17 t33
mid t54 t0 t28 t72 t9 t65 t0 t7 t28
mid t43 t27 t9 t65 t65 t58 t67 t79
long t15 t35 t49 t76 t14 t29 t72 t32 t41 t50 t59
long t37 t0 t67 t8 t10 t34 t45 t76 t45 t74 t39 t69 t43 t73
short t39 t43 t18 t65 t8 t57
mid t75 t14 t16 t32 t49 t20 t34 t55 t34 t25
long t27 t28 t11 t36 t56 t65 t74 t36 t46 t50 t4 t27 t7 t19
short t21 t20 t57 t30 t48
short t65 t7 t54 t44
short t11 t32 t55 t77 t6 t64
mid t69 t8 t71 t21 t68 t75 t74 t35 t21 t18
long t8 t37 t18 t77 t74 t15 t64 t68 t36 t59 t4 t20
long t11 t58 t6 t67 t19 t2 t0 t24 t48 t17 t26 t36 t16
short t73 t49 t65 t8 t68 t58
mid t67 t73 t0 t72 t6 t44 t20 t32 t51
long t0 t32 t59 t25 t52 t48 t15 t66 t8 t73 t2 t18 t56 t36
mid t22 t28 t3 t79 t38 t55 t51 t60 t21
short t62 t65 t44
mid t77 t18 t78 t25 t48 t7 t45
short t32 t59 t77 t75
short t38 t7 t50 t50 t57
long t63 t52 t13 t46 t64 t15 t69 t43 t7 t78 t42 t49 t16
long t49 t65 t22 t23 t11 t57 t78 t67 t17 t35 t41 t19 t61
short t5 t12 t2 t66 t4 t71
long t8 t75 t12 t25 t50 t22 t10 t66 t15 t66 t40 t26 t49 t66 t70
mid t0 t47 t74 t12 t33 t5 t11 t2 t17
long t40 t39 t76 t9 t24 t8 t49 t65 t70 t41 t59
short t10 t45 t43 t59 t77 t9
long t19 t77 t53 t48 t47 t3 t21 t13 t71 t60 t58 t7
short t63 t66 t69 t59
short t60 t3 t39
long t9 t74 t74 t34 t63 t49 t54 t66 t48 t76 t47 t57 t27 t7
long t18 t71 t75 t7 t9 t66 t9 t43 t68 t9 t58 t35 t75
long t60 t10 t27 t60 t71 t48 t20 t16 t18 t25 t36 t18
long t18 t62 t14 t29 t42 t12 t25 t77 t3 t9 t65 t9 t35 t36 t6
short t65 t9 t49 t79 t53 t23
short t43 t79 t9 t74
long t44 t14 t69 t61 t74 t11 t75 t69 t60 t67 t23
short t72 t27 t40 t10 t6 t71
mid t43 t25 t39 t59 t8 t52 t5 t14 t2 t59
mid t61 t75 t72 t34 t79 t6 t69 t45 t48 t13
long t6 t69 t77 t78 t15 t11 t16 t75 t43 t42 t3 t6 t11 t21 t9
short t25 t7 t1 t9 t32
mid t70 t77 t54 t11 t59 t27 t49 t15 t62 t62
mid t62 t4 t52 t50 t24 t7 t48 t48 t43 t44
short t23 t54 t23
mid t31 t72 t21 t1 t53 t1 t8 t73 t56 t59
mid t39 t20 t61 t64 t77 t17 t52
short t53 t69 t49
long t30 t5 t21 t77 t3 t55 t9 t45 t6 t19 t27
long t61 t44 t32 t15 t33 t8 t32 t57 t79 t0 t34 t50 t51 t14 t24
short t22 t42 t35 t53 t25
long t27 t28 t41 t21 t22 t12 t12 t43 t60 t2 t42
short t52 t39 t11 t44 t1 t77
long t49 t79 t38 t13 t19 t1 t42 t47 t15 t6 t19 t39
long t6 t72 t19 t63 t13 t42 t4 t10 t39 t54 t43 t29 t56 t20
long t69 t9 t53 t21 t79 t27 t65 t76 t17 t37 t10 t21 t27 t6 t42
mid t48 t26 t72 t15 t68 t42 t55 t21 t60
long t18 t4 t27 t53 t45 t30 t73 t27 t61 t57 t67 t67 t46 t50
long t36 t23 t61 t63 t70 t11 t76 t11 t33 t29 t11 t1 t66
short t0 t18 t35 t5
short t72 t75 t73 t34 t59 t37
mid t2 t5 t39 t32 t39 t34 t69 t22 t5
long t56 t76 t29 t10 t69 t51 t54 t58 t61 t12 t62 t56 t78
short t19 t56 t79
long t59 t27 t77 t21 t68 t41 t69 t30 t10 t52 t77
mid t68 t23 t41 t32 t6 t74 t34 t26 t11
mid t51 t46 t52 t52 t61 t65 t29 t16 t72 t3
mid t48 t76 t29 t37 t58 t63 t40 t74 t4
mid t70 t59 t73 t11 t12 t36 t40 t15
short t48 t23 t71 t79 t30 t29
mid t48 t64 t75 t45 t29 t56 t13 t44 t78
long t73 t28 t72 t71 t48 t16 t20 t75 t6 t15 t27 t5
short t3 t5 t64 t15 t66 t20
short t14 t34 t49 t9 t39 t16
long t37 t22 t41 t3 t57 t23 t24 t26 t0 t38 t12 t72 t0 t25 t28
mid t49 t73 t14 t30 t38 t12 t19 t9
mid t61 t52 t2 t13 t73 t38 t56 t54 t28 t18
mid t2 t58 t6 t36 t70 t5 t9 t14 t58
short t19 t30 t43 t28
mid t57 t32 t73 t41 t30 t76 t39
mid t57 t61 t64 t36 t66 t4 t57 t28 t52
short t47 t55 t49 t30 t27
short t45 t6 t62 t47
long t53 t27 t16 t8 t27 t6 t27 t44 t6 t55 t33 t34 t10 t3 t2
long t79 t42 t7 t71 t56 t37 t3 t49 t5 t68 t62 t10
long t21 t75 t17 t75 t62 t38 t78 t76 t76 t72 t65 t30
mid t69 t27 t69 t59 t49 t40 t66 t9 t60 t32
mid t23 t78 t78 t65 t6 t35 t63
mid t32 t3 t78 t30 t55 t13 t72
short t44 t3 t49 t35 t49 t33
long t26 t31 t75 t60 t77 t4 t30 t57 t1 t17 t13
long t23 t12 t2 t55 t32 t62 t37 t34 t16 t4 t51 t51
long t3 t36 t38 t53 t14 t7 t41 t5 t74 t30 t73 t68
long t7 t56 t8 t14 t17 t12 t44 t74 t14 t76 t79 t58 t46 t4 t0
long t67 t60 t59 t65 t72 t6 t55 t50 t62 t18 t67 t59 t46
long t49 t63 t78 t51 t0 t12 t54 t19 t40 t39 t65
long t79 t25 t48 t69 t36 t18 t54 t0 t58 t51 t39
long t17 t58 t37 t28 t14 t21 t78 t36 t19 t26 t54 t8 t69 t32
short t57 t11 t0
mid t2 t17 t23 t35 t12 t41 t13 t48
long t75 t44 t4 t2 t50 t25 t51 t20 t74 t6 t61
long t74 t32 t28 t22 t49 t49 t33 t2 t69 t66 t22 t16 t71 t14 t11
long t75 t47 t27 t59 t21 t32 t74 t32 t59 t55 t66 t45 t49 t20
short t13 t20 t74 t56 t11
mid t52 t73 t22 t57 t35 t26 t48 t46
long t65 t14 t79 t16 t45 t39 t14 t26 t47 t27 t27 t76 t7
short t5 t25 t15 t55 t44
mid t55 t50 t77 t44 t37 t27 t45 t74 t38 t65
short t54 t41 t76 t17 t18
short t53 t30 t12 t59
long t59 t38 t34 t69 t11 t71 t8 t29 t38 t5 t50 t64 t76 t41
long t26 t13 t68 t57 t58 t18 t72 t9 t79 t10 t41
mid t32 t49 t57 t43 t78 t69 t14 t32
long t26 t72 t2 t40 t42 t3 t25 t3 t29 t20 t17 t58
short t55 t34 t17
short t50 t62 t21 t28 t62 t65
mid t78 t22 t70 t27 t1 t29 t78 t41 t77 t58
mid t40 t57 t72 t23 t12 t37 t42 t5
short t23 t76 t47 t29
mid t8 t58 t36 t54 t66 t43 t46 t46 t48 t52
short t18 t78 t27 t23 t0 t36
long t32 t6 t8 t48 t37 t50 t21 t54 t78 t21 t76
long t3 t46 t60 t20 t19 t20 t31 t4 t47 t55 t66
mid t16 t40 t23 t31 t42 t71 t8 t73 t26
mid t41 t5 t71 t37 t43 t22 t59 t78 t47 t65
long t9 t16 t41 t33 t43 t72 t18 t20 t14 t77 t12 t18 t23 t13 t35
short t69 t76 t41 t34 t44
long t45 t39 t12 t29 t55 t0 t6 t32 t59 t39 t40 t22 t78
mid t52 t64 t12 t56 t25 t17 t1 t57 t39 t0
short t25 t41 t70
long t77 t46 t72 t43 t46 t50 t60 t9 t49 t3 t20 t16 t47 t20
long t11 t73 t70 t19 t66 t76 t25 t54 t0 t8 t74 t41 t69 t60
long t21 t6 t68 t4 t24 t65 t66 t72 t9 t1 t25 t22
long t63 t23 t20 t32 t45 t5 t29 t47 t25 t77 t34 t54 t51
long t30 t47 t24 t62 t53 t2 t7 t78 t16 t4 t1 t63 t40 t20
short t32 t65 t34 t65
mid t47 t21 t41 t27 t26 t23 t21 t76 t17
short t43 t13 t29
long t6 t20 t2 t0 t69 t7 t27 t12 t72 t53 t44 t27 t74 t76 t49
mid t12 t34 t36 t11 t17 t19 t1
short t2 t71 t53
mid t31 t22 t16 t59 t62 t22 t13 t44 t62
long t50 t3 t43 t20 t59 t44 t34 t52 t29 t43 t8 t39
mid t38 t28 t53 t68 t4 t71 t20 t21 t56
mid t23 t17 t57 t36 t34 t70 t52 t26
mid t49 t54 t49 t55 t49 t10 t15
mid t79 t46 t18 t78 t21 t49 t34 t12 t53
long t65 t78 t48 t75 t63 t58 t0 t42 t3 t15 t72 t16 t3 t8 t63
long t66 t38 t42 t5 t52 t29 t44 t38 t24 t49 t46 t0
long t60 t18 t9 t77 t1 t3 t12 t52 t68 t46 t44
mid t67 t24 t9 t7 t52 t16 t78 t1
short t61 t68 t1 t26
short t50 t34 t32
short t0 t31 t30 t23 t8 t75
short t28 t56 t76 t64
mid t53 t65 t41 t33 t28 t8 t56 t27 t23 t19
long t69 t77 t42 t44 t72 t5 t10 t41 t31 t33 t15 t73 t34
short t17 t66 t41
short t65 t15 t62
long t43 t16 t50 t74 t24 t24 t16 t5 t61 t45 t42 t54 t37 t62
long t1 t38 t43 t71 t33 t14 t59 t78 t22 t66 t74 t12 t31 t55
short t28 t71 t52 t46
long t55 t20 t1 t59 t52 t73 t36 t46 t39 t60 t68 t25 t75 t60 t79
short t49 t44 t23 t39
long t23 t0 t5 t76 t42 t19 t2 t43 t19 t19 t52 t55 t73
long t65 t26 t38 t67 t65 t9 t3 t7 t78 t49 t52
short t44 t40 t15 t37 t50 t46
long t12 t54 t32 t24 t35 t34 t56 t6 t67 t69 t38 t60 t14 t31
short t51 t57 t42 t17 t7 t44
mid t73 t1 t78 t75 t25 t73 t2 t49 t15 t75
long t26 t70 t62 t67 t62 t62 t56 t71 t77 t2 t26 t8 t58
short t67 t48 t58 t7 t22
mid t41 t71 t37 t28 t74 t55 t10 t69 t75
mid t20 t34 t31 t65 t20 t58 t20
short t72 t71 t41 t41 t18
long t64 t23 t52 t21 t65 t29 t68 t76 t58 t70 t51 t68 t8 t23
short t21 t71 t23 t12
short t17 t45 t23 t65
long t75 t73 t64 t0 t78 t65 t28 t72 t69 t16 t32 t42 t20
short t50 t43 t38 t25 t68
mid t4 t74 t53 t67 t47 t62 t42
short t30 t16 t10 t62
short t4 t41 t50
short t17 t1 t27 t55
mid t50 t75 t38 t57 t77 t5 t14 t32
short t0 t41 t9 t61 t3
short t37 t35 t65 t10 t35
short t21 t55 t37
mid t32 t41 t21 t70 t21 t41 t19 t34
long t61 t51 t14 t56 t14 t23 t57 t70 t61 t28 t66 t24 t49
mid t34 t54 t48 t63 t47 t59 t63 t67
short t77 t29 t8 t35
mid t46 t25 t20 t77 t13 t21 t17 t46
short t52 t33 t70 t6 t34 t65
mid t54 t20 t8 t37 t63 t76 t59 t57 t35
mid t20 t13 t43 t60 t42 t24 t12 t6 t71 t66
mid t24 t26 t23 t40 t0 t48 t22
mid t48 t14 t57 t58 t51 t50 t36 t26 t5 t36
long t53 t58 t48 t43 t65 t5 t59 t38 t59 t74 t17 t56 t27 t30 t75
mid t43 t45 t29 t62 t5 t22 t64 t29 t26 t7
short t28 t35 t76
long t42 t33 t29 t46 t28 t28 t43 t67 t66 t76 t47 t32 t69 t7 t38
long t65 t42 t66 t41 t9 t67 t76 t25 t40 t44 t46 t18 t44 t26 t34
mid t39 t31 t57 t27 t47 t26 t38
long t38 t32 t28 t62 t27 t49 t30 t33 t11 t30 t37 t26 t1 t58
short t12 t20 t30 t47 t65
short t26 t45 t75 t22 t22
long t51 t72 t71 t24 t11 t32 t14 t55 t61 t18 t13 t51 t38
long t72 t7 t41 t68 t67 t45 t22 t20 t31 t42 t52 t28 t79 t40 t45
short t38 t11 t63 t26 t5 t23
long t2 t72 t28 t18 t16 t45 t32 t5 t50 t33 t1 t25 t73 t7 t57
short t53 t28 t59 t25 t67
short t68 t16 t60
long t34 t8 t49 t45 t28 t4 t6 t68 t40 t76 t7 t30 t26 t37
short t9 t69 t6
short t68 t7 t74 t47 t16
short t25 t76 t52 t73 t27 t44
short t59 t74 t57 t32
long t10 t65 t36 t66 t73 t58 t56 t38 t60 t5 t79 t1 t55
long t26 t16 t60 t10 t11 t16 t68 t20 t76 t26 t1
mid t30 t1 t22 t69 t22 t32 t48 t54 t18 t48
long t42 t29 t24 t56 t1 t44 t65 t31 t18 t49 t30 t65 t77 t58
long t47 t69 t45 t16 t51 t51 t1 t32 t58 t14 t7
long t68 t42 t39 t6 t0 t33 t49 t77 t58 t76 t9
long t0 t1 t36 t23 t53 t64 t52 t25 t44 t70 t60
short t29 t38 t76
short t30 t36 t35
long t30 t57 t46 t13 t3 t1 t77 t77 t39 t68 t71 t47
mid t57 t53 t58 t65 t25 t16 t40 t76 t55 t21
long t0 t70 t9 t31 t7 t34 t19 t63 t25 t70 t60 t12 t4 t40
long t41 t69 t26 t28 t71 t35 t9 t6 t60 t20 t19 t58 t30 t48 t78
mid t49 t46 t75 t27 t56 t0 t29 t35 t57
long t31 t34 t24 t24 t21 t15 t31 t51 t33 t54 t68 t22 t47 t11 t3
long t5 t78 t57 t65 t59 t13 t44 t35 t44 t62 t55 t43 t0 t6 t75
long t59 t62 t45 t30 t61 t23 t34 t30 t33 t33 t16
long t65 t9 t79 t47 t64 t12 t39 t21 t63 t11 t9
mid t57 t46 t33 t14 t46 t61 t9 t54 t20
long t0 t38 t48 t34 t1 t73 t1 t49 t32 t26 t68 t10
mid t1 t5 t14 t15 t67 t34 t60
long t31 t60 t60 t59 t61 t16 t70 t22 t26 t14 t13 t60
mid t29 t72 t36 t56 t38 t50 t41
mid t0 t48 t43 t63 t75 t72 t53 t1 t43 t56
mid t49 t41 t40 t50 t78 t53 t46 t24
long t18 t12 t1 t78 t57 t27 t60 t17 t30 t32 t59 t59 t14 t79
short t73 t45 t4 t66 t73
long t73 t34 t3 t11 t24 t69 t55 t23 t16 t36 t68 t15
short t0 t15 t11 t46 t60
mid t34 t29 t14 t1 t58 t65 t11 t28 t20
short t41 t8 t76 t0
mid t12 t36 t44 t13 t35 t43 t14 t1 t45
long t23 t36 t14 t19 t37 t51 t3 t17 t13 t42 t48 t35 t40
long t6 t27 t37 t1 t54 t64 t30 t77 t53 t5 t55 t17
long t55 t38 t7 t75 t42 t9 t41 t36 t29 t18 t32 t24
long t0 t22 t3 t31 t45 t62 t17 t36 t71 t71 t36
short t79 t21 t72 t77 t8 t11
long t72 t62 t79 t79 t37 t5 t61 t60 t40 t35 t35 t59
long t70 t0 t23 t26 t51 t35 t72 t53 t74 t55 t44 t53 t77
short t74 t12 t11 t66
long t14 t65 t31 t16 t43 t0 t46 t48 t40 t17 t77 t40
short t30 t78 t42 t56
long t28 t25 t74 t33 t47 t79 t79 t32 t20 t62 t10 t28
long t22 t53 t17 t2 t26 t35 t30 t25 t30 t71 t39 t43
short t14 t0 t35 t22 t75
short t3 t42 t36
mid t15 t33 t65 t26 t18 t36 t17 t18 t4
mid t9 t12 t62 t48 t28 t36 t43
short t31 t38 t76 t43 t76
mid t4 t45 t71 t0 t10 t75 t17 t24 t7 t57
long t52 t37 t61 t66 t46 t2 t2 t63 t54 t36 t26 t31
mid t75 t0 t23 t52 t62 t62 t68 t61 t7 t15
short t13 t22 t58 t13
short t40 t45 t75
mid t30 t44 t14 t35 t28 t72 t63 t23
mid t48 t9 t73 t11 t30 t34 t71 t38 t74
mid t10 t25 t5 t43 t25 t49 t31 t70 t28
mid t51 t6 t11 t5 t65 t9 t50 t75 t8 t13
long t17 t33 t27 t66 t57 t12 t74 t37 t67 t19 t5 t23 t61 t35
short t71 t34 t24 t15
long t1 t15 t58 t60 t0 t71 t12 t11 t22 t43 t33
short t79 t7 t72 t35
mid t36 t10 t56 t64 t5 t18 t11 t72
long t76 t30 t47 t65 t4 t48 t24 t52 t59 t76 t14 t21 t21
short t77 t21 t18 t20 t49 t64
long t42 t53 t17 t33 t31 t59 t11 t31 t53 t33 t71 t79 t51
short t31 t3 t59 t45 t0 t23
mid t9 t79 t60 t64 t43 t16 t24 t78 t24
long t36 t33 t18 t52 t25 t58 t24 t55 t46 t73 t55 t73
short t32 t12 t29 t35 t32 t13
short t55 t68 t25 t12 t43 t73
long t25 t40 t30 t5 t60 t23 t56 t20 t12 t18 t73 t24 t5 t11 t38
long t68 t64 t64 t76 t29 t10 t70 t74 t63 t78 t2 t13
mid t42 t36 t1 t22 t2 t54 t52 t55
long t33 t1 t79 t18 t79 t12 t17 t57 t58 t38 t61 t69 t78
long t70 t55 t31 t48 t62 t62 t41 t0 t76 t49 t55 t71 t30
mid t65 t18 t0 t76 t48 t62 t27 t65 t9
long t34 t52 t58 t0 t8 t6 t16 t27 t74 t13 t64 t42 t6
long t26 t55 t6 t47 t41 t53 t8 t4 t78 t41 t15 t51
long t36 t23 t44 t19 t18 t37 t59 t24 t14 t61 t26 t0 t76 t53 t4
long t5 t30 t75 t55 t60 t12 t28 t5 t20 t78 t52 t66 t15
short t9 t62 t21 t40 t66
long t26 t75 t32 t49 t12 t33 t29 t19 t47 t61 t10
mid t56 t27 t76 t27 t76 t41 t18 t44 t38
long t52 t71 t55 t30 t46 t3 t71 t66 t50 t64 t46
mid t45 t31 t48 t40 t62 t1 t21
long t71 t31 t18 t0 t1 t37 t63 t50 t50 t18 t46
short t33 t42 t77 t0 t13 t61
short t48 t36 t66 t52
long t20 t50 t25 t72 t20 t33 t78 t37 t64 t50 t42 t3 t14 t76 t52
long t74 t13 t55 t0 t16 t25 t13 t77 t6 t41 t13 t37 t68
mid t74 t59 t76 t47 t34 t70 t51
long t5 t69 t43 t28 t59 t32 t35 t16 t73 t0 t40 t49 t28 t24 t37
long t16 t44 t4 t69 t24 t10 t7 t71 t68 t21 t53 t3
short t66 t67 t4 t28 t69
mid t53 t67 t72 t31 t12 t19 t46 t28 t72 t40
short t28 t28 t76
mid t56 t37 t76 t69 t73 t72 t41 t56 t67
short t53 t3 t78 t53
mid t19 t2 t75 t22 t47 t16 t20 t65 t7
long t65 t36 t22 t9 t71 t62 t42 t61 t46 t44 t6 t28
mid t58 t2 t10 t12 t76 t25 t19 t31
short t10 t35 t19 t53 t45 t6
mid t14 t27 t41 t12 t31 t23 t66 t22
long t20 t18 t56 t13 t73 t45 t74 t64 t10 t65 t12 t8 t7
long t74 t21 t19 t30 t39 t22 t61 t42 t3 t48 t16 t69
long t59 t58 t16 t56 t59 t66 t26 t24 t73 t36 t17
long t53 t59 t13 t3 t5 t77 t43 t25 t60 t71 t66 t79 t18 t59 t10
mid t76 t43 t59 t4 t30 t55 t47 t9 t29 t20
long t73 t8 t31 t48 t59 t27 t59 t61 t53 t18 t64 t40
mid t49 t35 t73 t30 t69 t74 t3 t30 t33 t70
long t46 t55 t53 t36 t37 t29 t38 t9 t10 t30 t26 t21 t71 t68
long t52 t21 t55 t60 t63 t59 t51 t78 t39 t8 t7 t51 t19 t1
long t13 t64 t41 t17 t76 t79 t1 t52 t43 t69 t44 t74 t57 t47 t2
long t29 t45 t29 t68 t63 t63 t44 t0 t20 t47 t78 t8 t64
short t74 t70 t29 t41 t49 t32
short t29 t49 t30 t6
long t14 t22 t78 t0 t21 t74 t35 t13 t12 t14 t14 t11 t46
mid t41 t50 t71 t53 t30 t29 t23 t52 t53
long t64 t22 t7 t23 t41 t62 t75 t16 t5 t0 t14 t57 t57
long t6 t75 t71 t43 t50 t42 t65 t43 t38 t37 t3 t39 t18
mid t12 t72 t9 t41 t17 t50 t11 t39 t40 t16
short t64 t48 t52 t49 t20 t38
long t65 t10 t10 t77 t36 t9 t72 t43 t33 t12 t22 t59 t23 t75 t62
short t25 t22 t72 t2 t67 t5
short t20 t15 t59 t43 t7 t62
mid t5 t73 t33 t4 t17 t76 t41 t77
short t9 t5 t75 t18 t75 t11
mid t49 t27 t17 t20 t77 t70 t6
long t10 t50 t39 t76 t42 t74 t4 t59 t14 t34 t16 t54
mid t63 t66 t17 t69 t52 t57 t1 t77 t61
long t65 t2 t16 t42 t43 t8 t66 t79 t55 t6 t6 t27 t27 t0 t79
long t2 t1 t17 t67 t60 t70 t55 t66 t54 t62 t33 t0 t32 t29 t25
long t0 t62 t35 t3 t36 t28 t68 t49 t69 t65 t75 t68 t37
mid t19 t32 t5 t48 t15 t72 t53
short t4 t43 t47
mid t61 t56 t48 t48 t28 t30 t76 t57 t0
short t14 t78 t37 t2
short t49 t53 t30 t17 t79
long t37 t65 t56 t39 t41 t58 t53 t23 t74 t7 t49 t23 t41
long t8 t33 t28 t17 t38 t21 t74 t60 t67 t60 t41 t44 t10 t56 t33
long t47 t12 t8 t44 t45 t59 t41 t79 t9 t27 t62
long t66 t41 t49 t43 t53 t67 t32 t32 t2 t56 t67 t74
long t47 t2 t72 t77 t38 t57 t30 t2 t19 t77 t35 t46 t63
long t38 t20 t69 t63 t76 t50 t62 t3 t18 t63 t76
long t50 t75 t20 t40 t65 t7 t76 t75 t40 t56 t69 t2 t77 t52
short t12 t41 t50
long t37 t4 t60 t40 t38 t64 t21 t38 t6 t69 t47 t40 t60 t14 t56
mid t3 t33 t45 t47 t66 t11 t43 t36 t14 t46
short t4 t55 t35 t63 t57
mid t57 t0 t79 t25 t25 t54 t48 t52 t26 t67
mid t46 t11 t40 t35 t6 t33 t9 t77 t73 t7
long t28 t51 t43 t21 t3 t44 t67 t44 t40 t32 t33 t77
mid t8 t22 t69 t3 t0 t74 t72 t34
short t21 t69 t4 t11
long t46 t75 t19 t46 t39 t47 t6 t65 t50 t6 t14 t47 t54 t31
mid t8 t3 t69 t40 t14 t66 t69
long t38 t70 t4 t8 t36 t5 t47 t46 t47 t19 t1 t32 t48
short t58 t26 t0 t44 t17
long t32 t35 t1 t27 t0 t7 t27 t6 t16 t61 t14 t43 t72
long t79 t69 t72 t18 t48 t51 t71 t74 t76 t50 t54 t60 t13
short t24 t44 t5 t18
short t30 t70 t5
mid t32 t69 t70 t72 t5 t53 t19 t51 t28 t21
short t79 t41 t1 t42 t69 t34
long t52 t53 t19 t56 t68 t50 t10 t27 t28 t69 t60 t24
long t8 t9 t43 t70 t62 t69 t26 t75 t53 t73 t2 t48 t9
mid t56 t24 t5 t68 t28 t21 t31 t42 t48
long t16 t66 t16 t77 t18 t1 t77 t28 t53 t35 t76 t8
long t47 t25 t76 t67 t10 t13 t11 t59 t2 t5 t21 t29 t0 t7 t24
mid t57 t72 t49 t16 t30 t76 t53 t7 t5 t11
mid t39 t70 t48 t12 t14 t55 t58 t20 t75
long t10 t70 t44 t17 t65 t55 t22 t44 t33 t17 t20
short t24 t62 t39
mid t68 t79 t75 t78 t54 t28 t21
long t55 t60 t18 t17 t7 t29 t8 t9 t18 t52 t37 t27 t17 t58 t65
short t0 t46 t33 t77 t63 t59
long t52 t29 t44 t30 t5 t68 t28 t0 t29 t46 t75 t54 t28 t13 t48
short t5 t70 t47 t37 t53
long t62 t32 t54 t76 t62 t30 t7 t9 t78 t7 t25 t11 t75
short t19 t4 t8
long t74 t60 t76 t69 t76 t5 t50 t33 t50 t0 t29 t19
short t5 t16 t22 t23
long t24 t40 t1 t19 t70 t68 t57 t37 t62 t59 t3 t44 t5 t55 t79
long t55 t52 t51 t30 t26 t18 t4 t12 t49 t46 t49 t20 t2 t77
short t68 t12 t5 t33 t22
short t1 t2 t1 t16
mid t33 t13 t47 t62 t36 t36 t77
long t47 t19 t49 t31 t20 t52 t59 t67 t10 t75 t43 t48
mid t9 t12 t27 t1 t16 t49 t27 t4 t56
mid t77 t78 t10 t14 t75 t69 t57 t26
mid t51 t51 t39 t66 t57 t39 t20 t6 t55
long t23 t28 t5 t73 t58 t12 t2 t39 t28 t77 t18 t71
long t32 t39 t67 t67 t61 t39 t49 t64 t54 t39 t75 t0 t65
short t76 t22 t18 t16
long t7 t79 t57 t10 t69 t23 t52 t29 t23 t8 t62 t32 t8 t23 t52
mid t11 t1 t28 t38 t35 t28 t28 t27
long t67 t58 t78 t63 t35 t12 t58 t14 t35 t75 t53 t54 t56 t3 t71
mid t32 t9 t16 t1 t61 t43 t39 t20 t27
mid t74 t32 t58 t17 t71 t67 t44 t66 t42
long t9 t54 t1 t70 t55 t73 t38 t56 t3 t50 t67 t2
long t53 t22 t67 t3 t55 t40 t41 t10 t49 t61 t5 t70 t72
mid t59 t3 t53 t26 t10 t5 t2 t31 t33 t55
mid t9 t57 t77 t75 t69 t20 t76 t43
short t34 t4 t29 t70 t53 t25
short t69 t47 t61 t79 t12
long t62 t23 t76 t73 t20 t62 t24 t46 t6 t5 t45 t19
short t33 t24 t23 t3 t6
mid t24 t39 t50 t2 t76 t5 t44 t16
short t70 t49 t21 t73 t69 t78
short t17 t41 t53
short t25 t36 t72 t13 t39 t31
long t53 t65 t45 t3 t63 t13 t26 t63 t51 t18 t76
mid t71 t23 t56 t11 t47 t13 t65
long t66 t25 t19 t32 t58 t18 t65 t41 t42 t53 t66 t10 t53 t13 t36
long t50 t28 t63 t10 t54 t39 t42 t5 t6 t9 t6 t6 t32 t38 t70
short t49 t67 t78 t4 t44
mid t15 t33 t4 t33 t19 t56 t40
short t69 t55 t55 t73 t11
short t21 t14 t74
long t35 t24 t44 t15 t56 t31 t37 t0 t36 t46 t4
mid t26 t52 t65 t36 t77 t2 t18 t4 t46 t12
mid t38 t9 t52 t32 t45 t12 t65 t36 t49
short t66 t58 t14 t22 t69 t36
long t57 t79 t39 t3 t29 t73 t72 t22 t42 t47 t65
short t11 t1 t13 t71 t77 t15
mid t52 t28 t71 t66 t36 t19 t69
mid t61 t64 t42 t35 t56 t71 t56 t36 t50 t14
short t74 t38 t66
long t73 t10 t48 t30 t70 t17 t43 t27 t4 t73 t53 t55
long t77 t29 t70 t0 t75 t10 t73 t20 t59 t64 t33
short t37 t9 t44
long t30 t15 t40 t67 t6 t42 t22 t1 t24 t11 t1 t71 t78 t59 t0
mid t15 t2 t61 t38 t42 t56 t16 t73
long t44 t34 t34 t61 t7 t30 t54 t28 t17 t6 t3 t73
long t57 t0 t7 t67 t62 t41 t45 t4 t34 t14 t50 t57
short t32 t2 t25 t70
long t7 t49 t34 t3 t46 t64 t65 t21 t21 t76 t23 t53 t11
short t21 t30 t24 t46
mid t68 t12 t15 t23 t44 t18 t23 t26
long t59 t18 t57 t52 t10 t38 t13 t12 t76 t6 t0 t10 t39
short t51 t34 t7
mid t25 t55 t9 t18 t32 t52 t36 t35 t15
short t56 t49 t63
long t67 t70 t54 t32 t16 t51 t46 t20 t44 t31 t35 t76 t51 t40
mid t19 t8 t57 t12 t51 t79 t38 t38
mid t12 t8 t71 t0 t4 t22 t75 t18
mid t63 t21 t38 t77 t37 t56 t1 t25 t14 t2
mid t32 t56 t53 t15 t38 t49 t36 t48 t77 t57
long t24 t60 t64 t45 t1 t15 t59 t16 t75 t70 t51 t31 t79 t33
short t48 t73 t72
short t58 t31 t53 t8
short t27 t42 t50 t44 t15 t46
long t35 t70 t22 t3 t58 t64 t24 t3 t54 t15 t49 t10 t70 t10
short t26 t4 t53
mid t16 t28 t60 t77 t76 t7 t22
short t18 t21 t53 t17
short t71 t75 t52 t3 t8
long t46 t4 t24 t55 t68 t76 t13 t52 t31 t0 t37 t61 t42
short t58 t65 t77 t15
short t5 t16 t52
mid t9 t44 t46 t19 t74 t55 t41 t24 t21 t52
long t79 t35 t18 t20 t72 t1 t29 t54 t17 t56 t59 t0 t67 t62
short t56 t74 t22 t68 t46 t9
mid t20 t52 t14 t27 t11 t27 t29
mid t78 t57 t59 t45 t14 t5 t68 t9 t8 t78
long t7 t41 t79 t40 t57 t32 t31 t34 t41 t58 t58 t6
mid t33 t43 t35 t9 t45 t66 t1
long t7 t62 t54 t52 t4 t64 t14 t73 t41 t65 t78 t6 t54
short t77 t15 t35 t38 t20
mid t22 t11 t56 t52 t28 t11 t76 t73 t65
mid t57 t0 t24 t2 t61 t43 t37 t65
short t40 t66 t52 t37
short t59 t14 t32 t61
long t27 t70 t26 t17 t2 t73 t59 t31 t56 t7 t38 t59
short t7 t35 t49 t8 t78 t68
short t5 t60 t30 t78
short t31 t36 t15 t77
short t58 t11 t9 t30 t22 t46
mid t6 t28 t23 t13 t68 t51 t79 t12 t50 t42
short t79 t33 t7
mid t59 t14 t24 t41 t7 t32 t57 t75
long t71 t64 t29 t30 t13 t25 t7 t39 t65 t6 t40 t46 t55
mid t55 t18 t8 t76 t11 t59 t62
mid t21 t13 t15 t19 t49 t50 t61 t36 t16
short t26 t51 t11 t6
short t38 t52 t29 t10 t6 t72
mid t30 t45 t59 t78 t23 t20 t6 t27
long t15 t52 t64 t27 t16 t39 t73 t73 t52 t7 t23 t74 t74 t76
mid t79 t64 t29 t48 t75 t63 t38 t51
short t41 t26 t26
short t13 t65 t26 t76 t20 t27
mid t26 t18 t10 t78 t75 t8 t14
mid t75 t4 t27 t61 t3 t10 t74 t44 t65
mid t52 t66 t25 t6 t65 t59 t79 t59
mid t20 t39 t4 t75 t1 t54 t70 t61
mid t48 t51 t31 t58 t10 t16 t78 t24 t34
mid t29 t50 t42 t77 t59 t24 t61 t15 t32 t57
short t70 t18 t61 t28 t37
short t25 t31 t16 t41
short t32 t72 t54
mid t0 t4 t59 t75 t31 t29 t22
short t39 t40 t1 t55 t77
short t28 t56 t62 t76 t27
long t7 t55 t1 t4 t45 t35 t13 t23 t32 t61 t78
mid t23 t13 t76 t57 t23 t57 t53 t11 t16
short t28 t75 t3
long t22 t79 t67 t26 t20 t30 t10 t14 t39 t12 t66
short t25 t60 t18
long t76 t12 t41 t11 t16 t12 t54 t28 t20 t18 t40 t46 t74 t39 t13
long t79 t65 t35 t41 t0 t45 t8 t35 t12 t24 t4
mid t45 t71 t53 t29 t29 t52 t76 t65
mid t47 t36 t45 t75 t52 t23 t68
long t7 t52 t32 t64 t50 t37 t15 t32 t15 t73 t70 t20 t2 t58
mid t47 t52 t56 t51 t8 t54 t54 t35
mid t64 t78 t31 t1 t25 t13 t57
mid t50 t48 t29 t7 t6 t48 t41 t0
short t50 t30 t50 t29 t78
short t17 t62 t59
long t61 t42 t3 t72 t59 t33 t19 t44 t57 t69 t51 t5 t46 t29 t43
long t75 t48 t47 t10 t0 t59 t43 t71 t29 t46 t77 t30
short t37 t5 t54
mid t65 t34 t24 t47 t74 t45 t29 t49
short t31 t14 t44
long t39 t55 t70 t54 t59 t54 t65 t18 t17 t58 t20 t17 t31 t8 t4
mid t8 t75 t72 t40 t24 t43 t30 t24
short t48 t1 t79 t9 t49 t42
mid t73 t57 t1 t73 t5 t12 t78 t37
short t49 t10 t60 t22 t74
short t8 t42 t46 t3 t10 t52
long t51 t17 t61 t6 t70 t45 t5 t62 t42 t14 t68 t15 t53 t72
long t35 t65 t2 t51 t31 t6 t2 t2 t27 t23 t64 t66 t24 t38 t11
long t3 t75 t73 t27 t77 t50 t8 t52 t11 t61 t45 t7 t17 t78 t39
short t52 t7 t12 t24 t57
mid t61 t5 t26 t58 t20 t15 t59 t43 t18 t40
long t3 t15 t72 t22 t73 t75 t14 t65 t28 t35 t9 t68
long t64 t78 t54 t15 t16 t16 t1 t38 t55 t39 t53 t18 t8 t28
short t56 t46 t27 t71 t59 t5
mid t42 t45 t32 t35 t44 t48 t61 t19 t58
short t16 t17 t72 t10 t19
long t30 t5 t27 t69 t68 t58 t19 t5 t46 t14 t58 t65 t50 t28
mid t67 t77 t26 t40 t22 t33 t78 t35
mid t55 t59 t35 t18 t16 t57 t57 t52 t28
mid t20 t2 t56 t66 t61 t50 t59 t3 t24 t8
mid t49 t2 t4 t75 t54 t56 t72 t52 t38
mid t68 t58 t3 t48 t49 t78 t18 t51 t2 t67
mid t77 t0 t8 t70 t23 t60 t56
mid t51 t2 t56 t24 t29 t57 t24 t49 t43 t51
mid t24 t25 t25 t63 t25 t25 t41
mid t78 t4 t47 t60 t74 t64 t20
mid t12 t56 t63 t40 t55 t17 t75
long t46 t38 t35 t61 t8 t11 t41 t47 t5 t78 t18 t13 t61
short t52 t62 t49 t64 t61 t57
mid t40 t31 t27 t57 t33 t6 t68 t62
long t11 t75 t77 t9 t6 t9 t28 t11 t8 t51 t75 t62 t78 t65 t61
short t11 t12 t8 t35
short t22 t50 t23
long t15 t57 t3 t26 t32 t74 t31 t44 t15 t12 t51 t3 t56 t73 t0
mid t24 t74 t34 t60 t77 t74 t74
long t45 t68 t41 t67 t0 t67 t42 t2 t55 t17 t54 t23 t22
long t10 t1 t23 t22 t28 t19 t73 t13 t22 t1 t26 t11 t42 t0
mid t70 t48 t66 t58 t40 t73 t35 t43 t37 t40
long t31 t29 t64 t47 t59 t39 t28 t34 t77 t57 t7 t13 t50 t9 t46
short t62 t14 t19 t20 t54
long t77 t72 t33 t50 t16 t1 t37 t78 t64 t38 t28
short t59 t73 t61
mid t60 t23 t21 t11 t50 t20 t11
long t5 t13 t47 t42 t17 t0 t28 t78 t13 t71 t23 t49 t24 t28
long t64 t21 t22 t68 t5 t40 t47 t49 t50 t48 t0 t6 t65 t67 t57
mid t74 t71 t23 t13 t6 t73 t29 t4 t65 t9
mid t76 t57 t14 t15 t6 t61 t73
long t47 t7 t37 t42 t73 t76 t54 t7 t22 t22 t15 t71 t74
mid t47 t61 t21 t34 t64 t73 t76 t0 t23 t35
long t6 t51 t75 t13 t17 t79 t42 t62 t50 t50 t51
short t75 t78 t30 t66 t58
long t51 t14 t15 t55 t65 t19 t10 t41 t67 t0 t56 t57 t57 t79
short t37 t40 t78 t23 t48 t28
long t66 t37 t0 t19 t43 t3 t44 t8 t56 t60 t28 t1 t32
mid t69 t64 t0 t63 t60 t77 t9
long t71 t3 t45 t37 t23 t56 t20 t78 t24 t40 t41 t10
mid t5 t9 t69 t39 t71 t71 t48
short t3 t0 t41 t27
long t13 t12 t36 t51 t21 t28 t65 t45 t45 t43 t69
mid t26 t43 t74 t43 t51 t9 t32 t43 t35
mid t78 t2 t74 t30 t58 t22 t62
long t44 t9 t30 t30 t43 t33 t57 t41 t43 t33 t62 t60 t1 t51 t23
long t33 t25 t44 t17 t1 t50 t21 t23 t66 t43 t16 t31 t29 t36 t15
short t65 t34 t75 t73 t3
mid t67 t39 t21 t32 t46 t20 t76 t28 t2
long t53 t26 t11 t21 t28 t54 t23 t72 t45 t64 t79 t34 t7
short t46 t1 t61 t24
short t32 t19 t25
short t28 t58 t44
mid t5 t65 t65 t1 t27 t71 t15 t20 t23
long t37 t22 t70 t55 t1 t59 t37 t65 t57 t67 t15 t71
long t47 t60 t41 t25 t22 t65 t46 t70 t74 t0 t71 t58 t74 t1
mid t26 t71 t21 t10 t38 t18 t59
short t30 t77 t15 t3
mid t68 t23 t1 t1 t50 t25 t24 t51 t13 t9
mid t18 t17 t51 t3 t36 t33 t49 t49
mid t26 t15 t36 t71 t8 t76 t25
mid t43 t32 t76 t68 t67 t76 t15 t70
short t44 t77 t3 t31
long t69 t33 t20 t27 t78 t24 t72 t59 t45 t48 t0 t70 t59 t63 t51
long t44 t8 t6 t49 t32 t26 t20 t35 t44 t31 t26 t38
long t48 t59 t30 t24 t51 t33 t75 t67 t6 t22 t14 t40
mid t22 t23 t66 t6 t54 t73 t23 t77 t65 t50
long t75 t64 t11 t46 t5 t4 t5 t51 t17 t47 t15 t58 t0
short t55 t12 t2 t52 t25 t51
short t37 t48 t56
long t41 t69 t52 t70 t37 t78 t69 t61 t67 t40 t15
mid t13 t18 t78 t47 t39 t70 t13 t2
long t12 t24 t4 t38 t9 t49 t65 t17 t15 t25 t36 t31 t44 t73
long t20 t3 t12 t14 t63 t18 t56 t51 t25 t37 t63 t15 t33 t12
short t66 t32 t60
mid t72 t24 t72 t67 t57 t2 t11 t6
short t17 t78 t47 t41
short t12 t77 t2 t33
mid t38 t12 t41 t20 t15 t30 t71 t22 t18 t39
short t54 t3 t16 t28
long t29 t63 t5 t40 t8 t70 t8 t77 t5 t78 t6 t7 t70
mid t71 t0 t41 t30 t54 t52 t44 t64 t61 t31
mid t62 t1 t59 t31 t16 t71 t1 t52 t53
long t10 t15 t22 t49 t9 t54 t64 t51 t25 t1 t14 t21 t15 t71
mid t16 t23 t59 t30 t30 t6 t60 t71
long t39 t10 t3 t41 t33 t32 t53 t58 t53 t21 t77 t33 t55 t70
long t5 t61 t57 t78 t6 t51 t64 t7 t33 t36 t54 t63
short t22 t29 t27 t14
mid t66 t16 t22 t60 t57 t59 t19 t56 t22
mid t36 t33 t68 t26 t66 t42 t46 t56 t73
mid t4 t26 t24 t61 t25 t20 t79 t38 t67 t74
short t20 t35 t4 t13
mid t48 t51 t6 t48 t73 t68 t7 t79 t25 t54
long t9 t79 t44 t2 t46 t61 t43 t68 t61 t26 t56 t28 t29
mid t37 t48 t20 t4 t47 t72 t16 t38 t22
long t27 t40 t56 t38 t29 t3 t52 t40 t14 t36 t56 t17
short t33 t2 t0
mid t65 t45 t75 t72 t66 t47 t46
short t52 t52 t10 t6 t78 t57
short t5 t58 t37 t63 t7 t9
short t47 t17 t29 t27
short t13 t30 t13 t14
long t32 t30 t42 t64 t31 t0 t25 t53 t69 t55 t0 t54 t38 t24 t64
short t32 t76 t44 t63 t35
long t72 t68 t45 t16 t56 t21 t19 t30 t22 t21 t50 t32 t63 t54
short t33 t52 t34 t42 t6
long t74 t6 t57 t66 t29 t28 t3 t35 t58 t7 t64
short t16 t29 t29 t72 t34 t62
long t24 t76 t31 t50 t77 t51 t79 t78 t3 t12 t40 t0 t62 t3 t7
mid t45 t22 t18 t57 t18 t72 t40 t9 t33
long t17 t28 t35 t18 t70 t61 t62 t63 t57 t57 t27 t59 t14 t68 t25
short t75 t70 t13 t78 t62
long t24 t32 t70 t31 t11 t20 t77 t21 t11 t46 t45 t60 t7 t44
long t4 t67 t23 t52 t19 t19 t54 t39 t46 t37 t4 t7 t79 t77 t6
short t60 t62 t40 t21 t67
mid t78 t9 t53 t9 t2 t59 t79
long t34 t75 t62 t44 t60 t79 t55 t25 t6 t3 t55 t60 t4 t49 t79
long t12 t32 t21 t67 t71 t48 t52 t48 t63 t3 t9 t79 t7
mid t39 t9 t31 t73 t32 t68 t41 t70 t20
long t43 t34 t6 t32 t0 t67 t43 t7 t54 t42 t26 t66 t17
long t26 t35 t33 t28 t73 t37 t1 t35 t18 t74 t5 t56
short t2 t10 t3 t44 t12
short t5 t38 t17
long t15 t41 t51 t65 t20 t49 t60 t23 t17 t75 t74 t14 t49 t34
long t66 t32 t32 t61 t5 t19 t42 t72 t2 t52 t23
short t18 t40 t3 t18 t63
short t13 t49 t75 t2
long t44 t13 t14 t16 t16 t24 t46 t24 t14 t17 t50
long t62 t27 t52 t5 t50 t6 t7 t4 t58 t47 t19 t31 t64 t20 t39
long t4 t34 t49 t58 t9 t1 t11 t62 t3 t42 t10 t55
long t16 t72 t13 t4 t19 t65 t36 t55 t30 t47 t1
mid t76 t76 t74 t39 t37 t30 t72
short t76 t71 t21 t10 t24 t33
short t46 t70 t40 t40 t33
short t23 t43 t50 t23 t31 t14
long t71 t24 t64 t42 t77 t14 t58 t1 t78 t56 t77 t26
short t63 t53 t78 t5 t50
short t21 t47 t68 t36
long t59 t43 t19 t10 t44 t43 t56 t59 t24 t63 t78 t21 t5
short t28 t67 t10
short t43 t25 t44 t11 t63 t53
short t22 t51 t1 t60
short t21 t20 t68 t35
mid t2 t63 t9 t6 t70 t36 t5 t53
mid t68 t53 t17 t36 t30 t5 t36 t30 t78 t44
long t60 t65 t63 t22 t2 t13 t14 t10 t44 t28 t15 t44 t6 t62 t76
short t6 t6 t29 t52 t46
mid t63 t32 t33 t65 t63 t70 t38 t37
mid t76 t50 t7 t52 t27 t16 t51 t6 t79 t4
long t16 t26 t55 t6 t72 t39 t16 t49 t69 t41 t46 t30 t15
mid t20 t32 t16 t43 t77 t41 t9 t6 t36
short t55 t5 t45 t20
mid t18 t40 t67 t65 t45 t12 t9 t45 t33
long t31 t43 t62 t16 t79 t30 t68 t71 t5 t72 t64 t49 t37 t33
short t11 t1 t22 t27 t7 t63
mid t29 t60 t19 t22 t56 t40 t64
short t17 t68 t7
long t76 t2 t70 t19 t48 t12 t46 t53 t69 t23 t74
short t37 t65 t57
short t78 t72 t11 t44 t45
long t19 t43 t75 t8 t19 t11 t71 t49 t66 t32 t27
short t75 t15 t39 t61 t67
long t64 t77 t16 t2 t39 t48 t33 t42 t29 t39 t75
long t7 t55 t24 t8 t43 t40 t62 t27 t74 t33 t63 t46 t16
short t28 t78 t11 t24
mid t27 t10 t64 t74 t32 t53 t74 t43
mid t27 t58 t65 t23 t35 t25 t79
mid t39 t75 t76 t69 t55 t56 t78 t5
long t70 t28 t65 t49 t24 t23 t6 t1 t15 t6 t39 t11 t23 t32
mid t16 t39 t7 t58 t54 t75 t23 t6 t62 t63
short t21 t17 t49 t54
long t35 t12 t65 t58 t5 t44 t6 t23 t15 t74 t15 t22 t41 t64
mid t35 t67 t42 t12 t65 t41 t49 t26 t70 t44
mid t10 t14 t29 t16 t67 t15 t24
mid t10 t43 t12 t18 t37 t22 t45
mid t49 t74 t25 t23 t33 t63 t79 t38 t53
mid t73 t78 t36 t2 t2 t57 t74 t60 t9 t31
mid t16 t12 t34 t4 t16 t61 t24 t67 t34 t10
long t72 t32 t33 t45 t73 t37 t19 t76 t39 t66 t32
short t42 t18 t73 t76 t22 t63
long t35 t34 t38 t12 t28 t48 t72 t21 t19 t46 t32 t9
mid t28 t47 t48 t9 t15 t67 t61
short t61 t79 t1 t48 t72 t33
long t50 t13 t2 t59 t5 t59 t20 t33 t52 t21 t23 t58
long t6 t34 t12 t45 t75 t55 t1 t76 t25 t23 t76 t23
long t45 t69 t27 t65 t34 t47 t36 t28 t51 t75 t31 t4 t5 t3 t2
long t53 t48 t75 t78 t20 t71 t3 t71 t61 t41 t27 t7 t5 t2
mid t79 t20 t61 t17 t61 t51 t33
long t19 t69 t34 t4 t70 t47 t63 t3 t13 t74 t15 t31
mid t54 t32 t41 t49 t4 t9 t33 t34
long t1 t77 t13 t32 t50 t4 t24 t40 t46 t35 t55 t32 t42
mid t47 t5 t8 t50 t41 t39 t21
long t21 t16 t65 t68 t14 t22 t52 t71 t49 t42 t66 t67
long t32 t39 t20 t11 t33 t44 t71 t66 t68 t70 t13
long t27 t10 t35 t54 t16 t15 t57 t52 t44 t37 t32 t35 t8
mid t21 t61 t48 t40 t49 t20 t2 t18 t6 t7
mid t0 t68 t41 t76 t52 t15 t29 t21 t48
mid t12 t65 t63 t23 t78 t50 t79 t68 t43 t5
long t73 t76 t58 t41 t74 t65 t64 t4 t36 t0 t17 t74 t63 t15 t55
long t36 t61 t2 t77 t14 t35 t13 t33 t66 t5 t7 t6 t22
mid t28 t48 t68 t72 t45 t11 t51 t6 t2
long t77 t61 t60 t38 t58 t73 t35 t43 t76 t52 t21 t37
mid t22 t42 t71 t11 t8 t32 t30 t18 t2
long t12 t4 t61 t68 t8 t67 t24 t17 t22 t7 t69
short t25 t14 t39 t13 t79 t76
mid t42 t47 t59 t46 t75 t39 t3
mid t25 t25 t32 t72 t29 t46 t67 t39 t74 t69
long t43 t30 t39 t54 t56 t31 t0 t55 t64 t14 t31 t47 t21
short t40 t66 t44 t4
mid t65 t29 t37 t42 t36 t48 t6 t70 t34 t13
mid t54 t53 t78 t19 t25 t36 t10 t31 t30
long t58 t22 t1 t51 t79 t43 t13 t58 t79 t44 t42 t49 t46 t21
long t36 t6 t42 t40 t69 t56 t5 t44 t35 t66 t73
mid t44 t40 t20 t76 t49 t50 t9 t35 t13
mid t48 t10 t6 t60 t16 t74 t32 t20 t32 t48
short t16 t25 t8 t62
mid t33 t9 t39 t34 t79 t76 t6 t56
short t59 t58 t22
mid t5 t6 t38 t9 t14 t34 t1 t76
mid t44 t7 t4 t21 t34 t58 t18
long t38 t26 t76 t14 t1 t48 t58 t41 t56 t16 t15 t9 t40
long t11 t29 t54 t52 t17 t72 t31 t37 t76 t17 t64 t25 t64
long t51 t27 t34 t75 t67 t66 t43 t56 t47 t26 t70 t49
short t14 t9 t8 t70 t34 t48
long t25 t68 t78 t28 t12 t51 t41 t31 t15 t60 t77
mid t63 t22 t69 t62 t35 t38 t15 t56 t40
long t63 t11 t64 t65 t79 t66 t70 t1 t12 t31 t47 t34 t45 t18 t3
long t73 t47 t37 t2 t45 t20 t7 t13 t39 t24 t19 t9
short t62 t7 t10 t64
long t15 t35 t34 t24 t27 t70 t11 t13 t69 t49 t7 t3 t15 t51 t69
mid t51 t36 t7 t59 t17 t9 t66 t58 t23
long t40 t21 t51 t17 t42 t23 t33 t72 t68 t18 t21 t18
short t9 t2 t37
long t30 t30 t50 t8 t43 t61 t66 t49 t23 t61 t68 t48 t78 t65 t59
short t38 t14 t7 t70 t21 t13
long t64 t23 t58 t78 t35 t37 t77 t12 t19 t15 t33 t20 t64 t34 t59
long t40 t27 t37 t76 t3 t2 t40 t70 t26 t41 t65 t7 t43
long t22 t9 t59 t57 t41 t69 t0 t16 t4 t31 t59 t49 t47 t1 t38
short t4 t23 t16 t6
mid t18 t34 t34 t30 t43 t72 t65 t28 t52
mid t46 t21 t43 t6 t51 t7 t78 t54 t57 t65
mid t36 t30 t71 t20 t17 t62 t16 t67
long t1 t59 t27 t18 t50 t74 t37 t59 t1 t1 t13
mid t49 t15 t55 t43 t57 t31 t20 t79 t71 t68
long t77 t54 t3 t36 t65 t24 t53 t62 t71 t35 t74
short t56 t39 t42 t42 t49 t24
mid t64 t33 t19 t22 t27 t72 t15 t62 t39 t64
mid t40 t22 t1 t53 t52 t13 t75 t76
short t21 t7 t77 t70
short t28 t25 t60 t48 t26
mid t37 t64 t53 t2 t50 t28 t57 t56 t14
long t60 t51 t2 t33 t26 t52 t58 t38 t45 t78 t39 t41 t32 t68 t44
mid t38 t60 t65 t11 t78 t65 t11 t61 t69 t76
long t3 t49 t70 t24 t58 t76 t2 t45 t78 t27 t41 t27
mid t44 t67 t10 t10 t22 t56 t1
short t76 t4 t51 t39 t50
short t44 t36 t34
long t43 t0 t63 t12 t67 t11 t79 t19 t76 t39 t6 t2
short t63 t46 t8
mid t38 t71 t48 t6 t19 t63 t4 t27
mid t11 t62 t36 t25 t13 t29 t76
long t9 t42 t76 t75 t29 t69 t57 t11 t64 t68 t6 t72
mid t61 t67 t26 t3 t24 t6 t42 t16 t46
short t16 t61 t25 t14 t11
mid t28 t56 t52 t8 t71 t69 t37 t17 t10
mid t72 t8 t56 t64 t18 t65 t51 t20 t8 t31
short t42 t33 t60 t52
short t2 t31 t77 t47 t43
short t76 t39 t67 t44 t18
long t73 t23 t45 t64 t62 t7 t73 t36 t54 t62 t23 t37 t48 t16 t3
short t58 t48 t48 t5 t9
mid t49 t76 t29 t36 t44 t51 t21 t75 t50
short t11 t8 t75 t3 t61
mid t13 t61 t48 t26 t28 t62 t22 t77 t30 t67
mid t41 t48 t32 t34 t61 t19 t8 t36
short t70 t71 t22 t61
short t12 t0 t77 t67 t61
long t7 t46 t36 t53 t30 t23 t25 t45 t68 t4 t32
mid t1 t67 t47 t29 t55 t34 t42 t67 t8 t31
mid t72 t51 t45 t36 t53 t0 t22 t71
short t47 t74 t56 t55 t36 t2
long t8 t53 t26 t72 t73 t20 t25 t40 t57 t29 t40 t49 t72 t78 t26
long t4 t0 t12 t16 t76 t33 t43 t55 t40 t54 t6 t28 t59
short t42 t23 t35
long t39 t37 t44 t31 t34 t23 t13 t38 t30 t3 t69 t51 t15 t14 t36
mid t24 t63 t60 t19 t0 t21 t74 t4 t78
mid t59 t20 t31 t25 t6 t13 t14 t51
mid t19 t2 t49 t52 t76 t65 t14 t14 t48 t30
long t28 t41 t27 t9 t10 t41 t76 t9 t64 t52 t49
mid t79 t43 t30 t31 t37 t73 t56 t75
long t21 t17 t17 t44 t36 t69 t36 t50 t20 t5 t73 t28 t8
long t64 t53 t12 t18 t33 t64 t48 t32 t36 t61 t79 t63 t61 t69 t10
mid t60 t30 t16 t69 t63 t42 t37 t62 t56
short t73 t59 t73 t45 t64
short t24 t52 t76 t61 t67
long t17 t48 t38 t48 t57 t69 t27 t27 t31 t0 t4 t49
long t51 t72 t29 t43 t14 t39 t7 t28 t36 t29 t29 t58 t19 t9
long t40 t72 t33 t67 t22 t12 t19 t50 t14 t29 t75 t0
long t64 t40 t67 t37 t56 t76 t65 t67 t24 t68 t63 t53 t35
mid t14 t8 t31 t33 t50 t22 t69 t43 t4 t17
long t54 t58 t1 t74 t21 t79 t4 t5 t14 t45 t50
short t76 t50 t0 t62 t1 t77
mid t2 t13 t17 t12 t1 t73 t10 t68
long t71 t63 t22 t10 t71 t36 t79 t38 t45 t60 t51 t66 t39 t58 t55
long t57 t77 t73 t47 t53 t1 t70 t63 t6 t21 t46 t52 t9
mid t33 t0 t40 t34 t59 t48 t13 t65
mid t38 t30 t79 t18 t10 t46 t49 t67
short t8 t19 t21 t78 t41 t2
long t24 t68 t44 t74 t16 t13 t69 t63 t33 t5 t73 t15 t20
long t19 t48 t52 t65 t75 t32 t27 t71 t20 t29 t60 t69 t73
mid t45 t35 t54 t36 t64 t21 t17 t62 t37
mid t31 t44 t30 t16 t29 t20 t9 t12 t64
long t44 t8 t33 t51 t66 t16 t25 t5 t27 t11 t33 t69 t57
long t2 t23 t48 t2 t55 t45 t46 t68 t41 t29 t46 t17 t1 t18 t44
long t42 t74 t2 t23 t5 t47 t28 t63 t72 t71 t64 t57
short t11 t11 t25 t57 t40 t1
mid t71 t55 t54 t64 t42 t39 t72
long t53 t3 t71 t10 t61 t10 t64 t46 t59 t16 t53 t51
long t2 t7 t9 t64 t59 t35 t40 t68 t7 t39 t73 t52 t2 t12 t19
long t52 t78 t15 t2 t58 t59 t4 t72 t44 t39 t38 t0
short t45 t36 t56 t12
short t11 t65 t78
long t55 t4 t64 t1 t33 t26 t4 t47 t34 t69 t43
long t14 t41 t75 t8 t35 t60 t45 t5 t6 t12 t18 t77 t30
mid t29 t30 t56 t48 t54 t27 t58 t78 t23 t51
long t1 t52 t61 t50 t1 t77 t35 t52 t53 t35 t22
mid t3 t50 t71 t76 t72 t9 t65 t72 t13 t22
long t76 t9 t24 t37 t11 t17 t53 t11 t76 t36 t47 t47 t51 t17 t31
mid t36 t12 t39 t74 t30 t58 t58
short t36 t33 t47 t23 t71
long t42 t44 t52 t50 t73 t23 t76 t76 t47 t1 t19 t50 t2 t17
short t37 t60 t79 t70 t71 t22
mid t8 t74 t29 t47 t50 t61 t79 t23
mid t19 t9 t43 t57 t51 t37 t32 t28 t1 t71
long t18 t66 t65 t22 t9 t9 t35 t60 t59 t19 t42 t41
long t28 t46 t45 t26 t31 t8 t47 t14 t54 t57 t24
long t51 t31 t1 t36 t65 t54 t42 t66 t16 t43 t19
mid t56 t16 t15 t11 t65 t62 t59 t73 t17 t69
mid t25 t28 t72 t55 t34 t57 t34
mid t27 t7 t47 t42 t48 t53 t0 t70 t30 t16
long t68 t44 t28 t74 t34 t77 t26 t0 t3 t62 t0
short t43 t56 t47
long t46 t70 t36 t68 t23 t16 t50 t68 t4 t20 t28 t5 t6
long t21 t30 t44 t19 t9 t17 t43 t44 t31 t62 t52 t54 t66
long t48 t60 t6 t71 t18 t26 t3 t66 t52 t19 t50 t28
short t25 t45 t11
mid t59 t74 t53 t76 t40 t78 t19 t5 t58
long t53 t16 t9 t55 t62 t8 t27 t62 t10 t10 t27 t6 t63
short t11 t70 t36 t48
short t26 t60 t25
short t77 t51 t69 t49 t55 t57
mid t70 t24 t10 t30 t23 t25 t73 t26 t74 t60
short t50 t40 t1 t1 t78
mid t35 t33 t72 t44 t10 t30 t73 t41 t41
mid t15 t74 t67 t6 t79 t63 t35 t18 t39 t76
long t1 t49 t13 t64 t17 t26 t52 t28 t59 t19 t47 t58 t76 t28 t55
mid t79 t4 t28 t37 t15 t17 t18
short t3 t30 t5
mid t47 t34 t62 t35 t47 t17 t58 t43 t57 t49
short t69 t22 t74 t41
long t42 t9 t53 t54 t59 t39 t56 t40 t13 t38 t77
short t65 t8 t63 t37 t24 t26
short t70 t9 t34 t20 t56
short t76 t43 t17 t50 t34
mid t77 t67 t74 t46 t22 t69 t49
long t34 t10 t33 t43 t46 t60 t35 t50 t7 t52 t67 t56 t67 t24
long t37 t39 t52 t38 t41 t41 t18 t69 t28 t42 t56 t36 t14 t77 t33
mid t40 t12 t77 t0 t54 t71 t6 t45 t24 t4
short t40 t40 t69 t29 t64
long t9 t31 t71 t5 t17 t3 t21 t25 t57 t56 t60 t24
mid t47 t51 t63 t45 t20 t77 t63 t37
mid t23 t32 t3 t27 t43 t19 t49 t64 t19 t79
long t44 t27 t65 t75 t35 t55 t25 t54 t33 t39 t15 t48 t4 t47 t22
mid t14 t32 t10 t10 t12 t44 t58
long t20 t26 t26 t58 t44 t77 t41 t35 t34 t26 t38 t64 t52 t29 t23
long t34 t37 t60 t22 t2 t16 t59 t59 t55 t34 t42 t38
long t16 t74 t57 t4 t49 t48 t34 t39 t44 t58 t76 t60 t58 t48 t36
mid t43 t51 t74 t13 t15 t60 t19 t6 t55 t11
long t53 t73 t4 t35 t10 t41 t5 t28 t30 t59 t11
long t16 t46 t51 t14 t18 t49 t37 t18 t8 t18 t15 t2 t41 t10
long t54 t73 t42 t48 t27 t37 t43 t17 t18 t34 t73
long t46 t63 t64 t62 t71 t55 t4 t3 t5 t15 t31 t10 t71 t24
short t5 t58 t68 t46
short t8 t72 t68 t22
mid t9 t6 t37 t51 t77 t38 t4 t35
short t47 t5 t54
long t19 t48 t29 t59 t67 t54 t45 t25 t18 t75 t33 t48 t79
mid t50 t29 t18 t66 t33 t0 t60
mid t73 t39 t2 t15 t48 t71 t78 t56
long t57 t69 t31 t29 t50 t9 t19 t46 t10 t75 t12
long t41 t60 t70 t13 t79 t68 t26 t40 t76 t61 t48
long t77 t53 t42 t5 t65 t15 t35 t29 t32 t40 t59 t55 t8
long t12 t35 t10 t69 t24 t65 t31 t11 t17 t69 t60 t57 t21 t34 t24
short t27 t13 t58 t24 t76
long t19 t5 t57 t52 t25 t55 t9 t57 t35 t50 t21 t9 t5
long t37 t68 t65 t40 t30 t61 t36 t6 t11 t3 t19 t9 t9 t50 t62
mid t5 t7 t71 t69 t49 t23 t45 t43 t5
short t37 t59 t8 t34
mid t42 t33 t53 t16 t52 t2 t53 t24 t55 t60
long t59 t9 t43 t18 t25 t3 t39 t69 t25 t57 t7 t40 t45 t22 t10
long t18 t5 t46 t8 t76 t6 t41 t12 t31 t4 t66 t22 t52 t39
long t43 t62 t43 t65 t45 t13 t16 t70 t20 t9 t36 t24
short t20 t65 t48
long t4 t69 t47 t37 t32 t45 t30 t8 t50 t2 t7 t24 t43
long t45 t28 t8 t46 t19 t60 t20 t38 t2 t77 t11 t73 t54
short t64 t0 t17
short t1 t37 t63 t42
long t40 t71 t15 t20 t78 t19 t24 t14 t27 t41 t78 t27 t32 t43 t50
short t57 t50 t68 t11 t11 t29
short t24 t1 t49
short t72 t10 t28 t35
long t74 t71 t31 t43 t55 t15 t34 t68 t71 t38 t23
long t16 t52 t34 t17 t16 t19 t76 t41 t45 t79 t72 t76 t77
short t3 t32 t8 t70 t64
short t54 t30 t22 t7
long t79 t19 t73 t54 t9 t71 t39 t35 t23 t19 t68 t44
long t32 t35 t14 t53 t32 t74 t28 t56 t37 t13 t21 t78 t12 t39
long t64 t40 t69 t48 t1 t56 t41 t53 t6 t26 t55
mid t60 t9 t11 t31 t4 t78 t30
mid t53 t69 t30 t55 t20 t67 t7 t55
short t25 t29 t0 t46 t36 t43
short t55 t57 t70 t17 t46 t49
mid t46 t24 t54 t3 t52 t57 t46
mid t39 t66 t30 t49 t23 t67 t68 t39 t71 t54
mid t17 t73 t52 t49 t72 t57 t60 t44 t69
short t1 t2 t77 t5
short t17 t40 t64 t6 t77 t61
short t24 t54 t48
mid t49 t74 t62 t63 t24 t14 t26 t34 t53 t14
long t32 t48 t57 t21 t36 t18 t22 t48 t34 t66 t19
mid t22 t59 t3 t60 t11 t12 t42 t60 t65 t44
short t57 t74 t60 t14
mid t36 t68 t17 t10 t21 t0 t15 t17
long t0 t42 t10 t30 t10 t59 t21 t34 t8 t12 t26
mid t72 t2 t6 t11 t60 t26 t11
short t63 t35 t67 t17
short t60 t76 t43 t3 t17 t41
short t40 t72 t3 t62 t49 t56
mid t45 t17 t41 t39 t25 t29 t7
long t32 t26 t52 t60 t15 t25 t49 t59 t5 t20 t32 t52 t9
long t27 t38 t37 t4 t58 t52 t26 t63 t58 t60 t0 t58 t36
long t69 t0 t64 t9 t18 t3 t65 t7 t73 t14 t6 t30 t59 t55 t44
short t6 t33 t44 t63
long t78 t11 t9 t30 t6 t30 t22 t23 t32 t13 t13 t6 t13 t38
long t71 t54 t66 t12 t13 t31 t36 t10 t18 t13 t62 t78
long t7 t16 t72 t38 t57 t35 t71 t17 t1 t12 t15 t0 t69 t55 t12
long t52 t58 t41 t69 t45 t58 t26 t28 t18 t21 t76 t38 t68 t48
long t39 t56 t13 t20 t27 t71 t27 t15 t29 t44 t55 t64
mid t79 t23 t37 t14 t63 t79 t4 t59
short t44 t15 t33 t50
mid t61 t28 t52 t0 t12 t42 t77 t64 t6 t56
mid t54 t36 t72 t41 t1 t72 t7 t67 t46 t40
short t33 t35 t68 t26 t39 t3
short t60 t31 t28 t50
long t51 t36 t79 t22 t44 t68 t59 t7 t34 t50 t58 t55 t64 t56 t15
mid t22 t0 t35 t69 t42 t18 t14 t17 t55
mid t25 t43 t13 t29 t71 t59 t60 t22 t9
mid t36 t66 t62 t60 t12 t24 t68 t31 t40
mid t38 t3 t73 t50 t48 t34 t31
long t75 t19 t33 t22 t35 t54 t8 t50 t54 t8 t62 t22 t12 t55
long t0 t53 t72 t64 t56 t42 t7 t17 t6 t77 t54 t65 t11
short t15 t71 t59 t66 t15 t23
short t52 t54 t66 t68 t24 t2
long t13 t39 t49 t11 t38 t28 t67 t47 t48 t31 t48 t5 t68 t44
mid t13 t18 t24 t72 t13 t45 t9 t4 t0 t6
long t62 t43 t71 t65 t10 t8 t42 t49 t60 t18 t32 t47 t26 t47 t74
long t76 t61 t23 t70 t61 t69 t57 t75 t44 t40 t51
mid t28 t43 t22 t71 t56 t23 t20 t73 t9
long t5 t45 t37 t56 t72 t0 t55 t1 t69 t53 t19 t66 t66 t47 t58
short t38 t61 t68
mid t42 t11 t79 t74 t23 t42 t71 t1 t22 t35
long t18 t10 t62 t16 t13 t10 t54 t48 t4 t51 t48 t65
short t27 t70 t51
short t14 t79 t33 t23
mid t10 t29 t55 t0 t45 t59 t63 t35
long t55 t48 t58 t60 t55 t30 t62 t17 t67 t20 t69 t75
mid t17 t39 t10 t25 t49 t77 t0 t74 t72
mid t6 t46 t45 t4 t31 t76 t51 t53 t67
short t23 t17 t4
long t49 t37 t38 t45 t51 t20 t18 t42 t25 t34 t4 t24 t27 t10 t44
long t50 t46 t33 t50 t15 t34 t11 t33 t67 t38 t14 t41
short t6 t44 t64
mid t52 t17 t26 t76 t54 t46 t45 t51 t68
long t55 t17 t54 t71 t44 t64 t71 t53 t51 t58 t3
mid t20 t29 t45 t54 t50 t79 t50
mid t37 t29 t53 t53 t47 t13 t19 t4 t15
long t77 t19 t28 t10 t9 t72 t59 t9 t42 t27 t0 t18 t43
long t14 t19 t32 t55 t24 t58 t8 t77 t20 t36 t36 t2 t52 t35
long t75 t3 t11 t38 t72 t66 t65 t54 t52 t68 t77 t49 t19 t56 t27
mid t52 t75 t15 t12 t56 t66 t54
long t79 t38 t63 t14 t19 t45 t17 t43 t41 t7 t6
short t79 t15 t23 t72 t29 t61
long t54 t32 t61 t16 t12 t30 t71 t60 t54 t70 t33 t11
long t12 t16 t56 t77 t55 t8 t33 t41 t58 t40 t16 t52 t7 t70 t61
long t67 t54 t61 t22 t44 t43 t26 t26 t10 t8 t40 t29 t71
mid t0 t76 t67 t70 t43 t33 t37 t23
mid t17 t43 t16 t17 t39 t67 t2 t6
long t45 t17 t78 t1 t52 t2 t60 t19 t43 t60 t54 t70 t41 t29 t8
long t25 t14 t67 t25 t30 t35 t2 t64 t19 t38 t71
mid t51 t26 t5 t12 t28 t44 t75
mid t10 t62 t21 t66 t67 t71 t53 t56 t9 t23
mid t62 t33 t18 t65 t70 t52 t50 t26
mid t78 t21 t47 t11 t4 t40 t57 t44 t61
mid t9 t28 t13 t13 t48 t18 t38 t8 t65 t43
long t13 t15 t3 t62 t26 t49 t79 t65 t79 t52 t34 t41
short t40 t72 t67
short t58 t75 t67
mid t62 t39 t15 t48 t72 t54 t14 t11
short t67 t75 t77
mid t12 t70 t32 t30 t3 t49 t54 t72 t14
short t63 t3 t52 t42 t51 t43
short t69 t35 t52 t57 t27 t46
short t21 t6 t74
long t76 t39 t35 t27 t17 t47 t20 t0 t74 t25 t77 t31 t75 t60
short t31 t48 t69 t26 t6
long t50 t14 t13 t11 t75 t19 t79 t28 t48 t75 t36 t1 t61 t1 t78
short t55 t59 t57 t63
short t4 t52 t17 t2 t67
short t57 t30 t42 t62
long t18 t34 t72 t25 t77 t27 t34 t55 t11 t74 t7 t61 t46
long t20 t17 t56 t29 t74 t66 t17 t16 t25 t13 t51 t62 t40 t20 t55
long t56 t2 t52 t73 t57 t34 t23 t28 t25 t45 t16 t70 t64 t13 t21
long t32 t25 t11 t32 t0 t21 t10 t30 t53 t34 t5 t25
long t14 t38 t49 t4 t37 t69 t56 t51 t10 t78 t71
long t70 t33 t49 t36 t62 t30 t31 t49 t72 t27 t54 t73 t34
short t34 t54 t50 t13 t11
mid t45 t63 t17 t40 t55 t27 t56
short t71 t16 t54 t39 t31
short t35 t48 t16
long t40 t30 t1 t35 t41 t69 t18 t25 t54 t17 t31
long t53 t62 t32 t46 t6 t2 t72 t3 t43 t71 t52 t66 t35 t25 t28
long t0 t17 t45 t21 t52 t12 t70 t4 t40 t38 t25 t12
short t61 t10 t50 t16 t23 t65
long t78 t58 t58 t23 t49 t52 t40 t20 t59 t19 t19 t73 t78 t47
mid t25 t66 t20 t49 t0 t74 t41
short t40 t0 t31 t27
long t68 t79 t33 t46 t49 t13 t10 t64 t41 t77 t38 t15
mid t66 t4 t2 t74 t58 t73 t47 t74
long t4 t10 t54 t4 t41 t37 t71 t49 t72 t8 t62 t47 t50 t15
short t15 t21 t43
short t18 t69 t23 t42 t33
long t20 t63 t56 t17 t10 t68 t44 t67 t57 t14 t4 t74
long t46 t12 t52 t60 t38 t67 t23 t75 t52 t26 t78 t16 t10
mid t37 t4 t43 t78 t62 t52 t41 t17 t18
long t14 t37 t43 t54 t69 t68 t74 t64 t57 t37 t12
short t12 t23 t51 t5 t60 t3
mid t12 t57 t70 t69 t35 t22 t59 t56 t49
short t76 t72 t0
mid t67 t10 t70 t22 t50 t11 t12 t76
long t51 t71 t17 t13 t36 t39 t26 t42 t65 t67 t56
long t10 t28 t15 t7 t72 t76 t47 t13 t5 t67 t20 t33 t0
mid t5 t37 t66 t62 t62 t43 t13 t55
long t6 t24 t66 t52 t17 t54 t37 t10 t27 t72 t55 t54 t68 t27 t66
short t57 t44 t70 t39
mid t15 t54 t68 t2 t12 t25 t4 t7 t53
mid t55 t25 t76 t21 t70 t72 t38 t15
mid t65 t11 t75 t68 t39 t54 t79 t45 t34
short t13 t6 t23
short t43 t56 t56 t3 t32
long t15 t26 t20 t40 t73 t6 t37 t63 t16 t4 t49 t1 t31 t53
short t62 t12 t35 t72 t40 t72
long t5 t53 t78 t6 t28 t35 t2 t61 t73 t16 t78 t32 t32 t53
long t42 t17 t50 t33 t48 t27 t8 t1 t65 t22 t23 t3 t32 t52
short t61 t42 t29
short t23 t49 t23 t8
long t46 t59 t35 t77 t79 t12 t49 t27 t50 t68 t24 t62 t31
long t67 t4 t64 t3 t71 t46 t2 t9 t28 t79 t31 t73 t11 t46 t27
short t21 t56 t29 t14 t20 t11
short t26 t73 t10
short t47 t27 t52 t56
long t73 t5 t57 t73 t43 t34 t13 t7 t28 t30 t33 t61 t45 t64 t79
long t52 t61 t54 t36 t31 t63 t4 t60 t11 t67 t7 t60
long t46 t73 t13 t27 t52 t67 t18 t23 t1 t61 t10 t32 t36 t3
short t67 t75 t76 t33
long t79 t27 t11 t43 t63 t55 t68 t26 t1 t16 t79
mid t42 t34 t62 t6 t77 t65 t75 t37
long t51 t46 t24 t5 t25 t33 t1 t55 t11 t30 t46 t1 t18 t52 t61
short t78 t6 t27 t65
short t67 t5 t22 t19
mid t18 t62 t19 t38 t51 t49 t15 t19
long t46 t17 t70 t0 t53 t29 t79 t7 t33 t68 t76 t60
long t39 t33 t16 t35 t54 t45 t15 t63 t10 t21 t54 t53
short t42 t13 t64 t69 t61
long t45 t55 t3 t17 t9 t67 t77 t77 t23 t71 t75 t69 t68
long t61 t32 t65 t11 t32 t76 t5 t35 t40 t8 t4 t79 t76 t11 t39
mid t43 t11 t62 t73 t15 t3 t38 t51 t8
mid t56 t67 t43 t41 t23 t2 t74
short t2 t18 t31
mid t53 t77 t51 t1 t42 t24 t56 t39 t55
long t66 t31 t32 t23 t31 t7 t3 t47 t25 t37 t29 t28 t76 t13 t74
short t17 t8 t74 t68
mid t56 t75 t63 t3 t17 t43 t47
short t49 t15 t61
short t42 t16 t71 t22 t7
short t23 t61 t78 t15 t29
long t43 t43 t13 t73 t57 t69 t44 t75 t47 t42 t4 t8 t11 t37 t53
long t8 t48 t15 t76 t34 t31 t36 t42 t48 t63 t12 t24 t6 t0
short t44 t32 t69 t69 t18 t36
short t23 t78 t51 t15 t67
mid t29 t66 t19 t47 t66 t70 t50
long t31 t31 t68 t29 t48 t20 t0 t79 t11 t67 t64 t23 t43
short t76 t66 t75 t42 t52 t53
long t79 t49 t16 t46 t2 t24 t32 t71 t10 t68 t67 t63
long t34 t65 t21 t18 t41 t70 t51 t53 t40 t31 t17 t31 t35 t28 t49
short t44 t52 t54 t48
long t9 t14 t73 t62 t55 t7 t27 t51 t59 t16 t23 t36 t27 t72 t37
long t72 t72 t58 t51 t28 t37 t18 t47 t32 t56 t49 t8 t78
short t56 t32 t63
short t31 t26 t43 t79 t33
long t39 t36 t29 t65 t14 t38 t21 t72 t76 t33 t59
mid t40 t21 t4 t59 t49 t23 t19 t42
short t22 t48 t77
mid t1 t78 t11 t38 t51 t37 t11
long t14 t21 t49 t11 t78 t72 t23 t40 t10 t78 t64 t75 t60 t56
mid t71 t25 t4 t60 t79 t35 t65 t55 t47
long t47 t39 t45 t11 t24 t48 t52 t31 t46 t3 t17
mid t54 t10 t77 t24 t75 t51 t41 t40
short t39 t38 t66 t9 t2
long t50 t16 t40 t44 t42 t75 t14 t40 t24 t17 t70 t70 t26 t60
long t35 t38 t28 t34 t38 t0 t5 t61 t76 t64 t58 t66
mid t74 t49 t59 t78 t10 t79 t62 t5 t10 t0
short t65 t66 t18 t34 t22 t68
short t47 t44 t44 t7 t22 t58
short t75 t44 t55
mid t13 t28 t62 t67 t3 t69 t52
long t36 t48 t62 t46 t76 t59 t33 t18 t56 t70 t12 t2
long t16 t59 t17 t64 t8 t33 t50 t7 t61 t54 t4
long t65 t76 t28 t72 t43 t10 t4 t49 t9 t79 t30 t57 t30 t52 t1
short t34 t64 t38
mid t57 t79 t54 t43 t28 t14 t73
mid t13 t40 t29 t61 t33 t75 t69 t8 t9 t40
short t1 t41 t15
mid t3 t44 t58 t43 t2 t38 t23 t49
long t34 t40 t44 t51 t75 t24 t74 t7 t75 t64 t22
short t43 t24 t34 t77
long t76 t35 t15 t15 t21 t47 t23 t21 t76 t41 t62 t62
short t3 t47 t48
mid t9 t52 t49 t17 t3 t34 t20
mid t46 t58 t78 t58 t52 t63 t56 t8 t5 t30
long t37 t49 t62 t20 t11 t29 t50 t11 t11 t26 t12
long t34 t54 t29 t24 t15 t29 t47 t11 t79 t2 t39 t71 t19
long t61 t49 t30 t3 t30 t20 t0 t48 t50 t77 t56 t31 t43 t13
mid t34 t63 t35 t69 t28 t67 t56
short t72 t25 t8
long t28 t67 t70 t5 t1 t50 t5 t30 t15 t32 t50 t60
mid t63 t76 t62 t67 t15 t79 t20 t44
long t4 t48 t26 t19 t11 t63 t39 t41 t44 t57 t74 t46 t40
long t63 t47 t25 t38 t61 t22 t7 t2 t68 t1 t13 t25 t11
long t27 t1 t15 t33 t79 t50 t46 t66 t48 t10 t10
mid t22 t54 t77 t72 t52 t16 t5
short t17 t75 t44 t28 t33 t54
long t18 t43 t25 t2 t38 t27 t16 t66 t35 t64 t14 t16 t41
mid t37 t51 t55 t70 t26 t6 t8
short t35 t62 t48
mid t51 t30 t33 t40 t44 t9 t56 t25 t79 t49
long t60 t25 t25 t17 t25 t46 t16 t57 t46 t52 t11
mid t7 t54 t70 t49 t41 t8 t1 t21
long t56 t33 t56 t67 t12 t34 t64 t48 t50 t1 t64 t66 t36 t73
long t49 t70 t44 t64 t23 t54 t17 t5 t65 t44 t26 t77 t78 t44
long t58 t6 t64 t39 t13 t76 t42 t73 t15 t5 t66
short t65 t44 t19 t45 t18 t63
short t25 t49 t71 t43 t35 t0
short t21 t37 t67 t11
long t58 t74 t44 t75 t26 t35 t17 t46 t35 t24 t63 t29 t64 t45 t38
mid t41 t56 t0 t9 t39 t16 t34
short t38 t66 t45 t66 t28 t64
short t25 t34 t57 t4 t11
short t10 t0 t45 t28 t23
mid t63 t74 t27 t40 t22 t41 t43 t9
mid t5 t73 t55 t47 t50 t45 t53 t0
mid t71 t4 t20 t57 t30 t28 t71 t29 t25 t48
long t54 t18 t22 t42 t44 t35 t78 t12 t58 t79 t70 t58
mid t39 t9 t31 t68 t68 t33 t71 t3
long t48 t10 t22 t32 t77 t9 t20 t23 t2 t43 t29 t10 t70 t28
long t76 t36 t46 t26 t7 t27 t15 t16 t41 t53 t4 t79 t67 t25 t6
short t10 t16 t46 t75 t22
long t49 t73 t44 t45 t59 t66 t45 t20 t22 t73 t42 t30 t41 t33 t2
mid t41 t76 t59 t15 t31 t40 t34 t33
short t71 t18 t26 t52
short t66 t19 t20 t27
mid t60 t51 t29 t35 t17 t74 t28 t34 t11
long t11 t50 t10 t35 t38 t55 t51 t38 t25 t26 t38 t19 t78
mid t21 t34 t11 t1 t35 t24 t19
mid t34 t60 t11 t74 t77 t69 t29 t29
mid t63 t46 t52 t55 t11 t3 t43
long t33 t24 t48 t72 t27 t0 t4 t66 t44 t10 t22
long t54 t7 t7 t32 t34 t13 t55 t21 t31 t9 t51 t42 t39 t70
long t36 t17 t53 t24 t28 t55 t71 t66 t69 t66 t59 t8 t36
mid t58 t33 t20 t70 t3 t67 t51
long t24 t44 t0 t70 t29 t67 t34 t45 t70 t67 t28 t14
mid t8 t63 t22 t62 t64 t70 t59 t17 t78
long t38 t72 t58 t46 t16 t34 t13 t4 t51 t55 t7
long t49 t76 t35 t15 t34 t46 t77 t2 t56 t77 t45 t54 t65 t21 t17
short t39 t61 t5
short t44 t6 t10 t72 t5
long t1 t4 t42 t29 t52 t48 t7 t2 t55 t41 t30
long t45 t37 t71 t11 t70 t50 t26 t13 t60 t50 t33 t53
short t68 t12 t25 t66 t7 t28
short t68 t25 t15
short t65 t16 t48 t71 t61 t58
long t9 t53 t27 t19 t15 t35 t52 t3 t73 t0 t56 t21
short t29 t22 t18 t32 t19 t51
short t63 t58 t20
long t70 t71 t56 t27 t52 t32 t74 t14 t54 t68 t58
long t21 t41 t8 t54 t79 t51 t38 t54 t62 t53 t59 t6
long t58 t56 t37 t42 t27 t11 t19 t54 t45 t73 t46 t33 t1 t11
mid t58 t44 t25 t37 t38 t18 t35 t73
long t47 t52 t2 t36 t21 t23 t23 t25 t41 t45 t23 t23 t67 t5
mid t61 t6 t22 t20 t36 t29 t41
mid t79 t75 t31 t18 t75 t4 t34 t55 t76
long t63 t26 t24 t62 t79 t49 t28 t46 t9 t39 t8 t0 t3
mid t69 t41 t6 t58 t7 t61 t59
short t1 t65 t61 t10 t63 t38
mid t59 t71 t67 t5 t46 t45 t46 t27 t7 t38
long t65 t78 t52 t30 t60 t15 t50 t49 t36 t30 t42 t32 t21 t9 t48
mid t64 t79 t15 t28 t30 t25 t52
short t11 t12 t19 t2 t62 t21
mid t67 t34 t78 t51 t49 t73 t62 t50 t67
mid t11 t18 t73 t29 t23 t17 t2 t27
short t68 t45 t67 t63 t51 t54
long t28 t52 t54 t6 t28 t51 t72 t42 t14 t58 t0 t71
mid t55 t75 t73 t79 t62 t78 t3 t58
mid t53 t71 t7 t61 t45 t49 t35 t61
short t38 t42 t45 t46 t36 t55
short t31 t50 t3 t15
long t72 t72 t10 t3 t49 t25 t8 t35 t42 t79 t59 t38 t16
mid t64 t1 t44 t37 t39 t18 t73 t30 t34 t33
mid t19 t11 t22 t77 t51 t51 t71 t4 t5
long t31 t22 t72 t78 t47 t70 t71 t75 t23 t35 t3 t20 t3 t69 t53
short t7 t45 t30 t42
mid t36 t4 t79 t50 t52 t23 t45
short t64 t47 t13 t33 t45 t53
short t38 t49 t70 t9 t27
short t7 t4 t12
long t26 t5 t5 t28 t77 t18 t69 t0 t36 t0 t43
short t29 t37 t27 t1 t23
short t40 t50 t33 t5
short t59 t66 t76 t3 t17
short t74 t48 t50 t7
long t69 t47 t16 t48 t1 t64 t45 t12 t57 t9 t35 t73 t72
long t25 t33 t50 t14 t66 t30 t47 t1 t12 t70 t15 t75 t13 t56 t43
mid t1 t12 t76 t67 t74 t49 t11 t57 t77 t75
mid t14 t69 t68 t29 t43 t43 t74
mid t62 t73 t43 t11 t50 t50 t47 t27 t15 t57
long t5 t12 t20 t33 t36 t71 t65 t19 t53 t57 t66 t12 t28
mid t55 t61 t13 t67 t65 t60 t24 t54 t33
long t56 t14 t72 t50 t77 t7 t78 t75 t8 t67 t68 t63
long t55 t53 t72 t44 t45 t6 t32 t23 t25 t29 t12 t21 t24
long t60 t20 t78 t54 t29 t55 t1 t16 t34 t28 t27 t29
short t34 t25 t9 t19
short t22 t52 t30 t15 t26 t47
mid t10 t21 t56 t44 t55 t61 t10 t68 t67 t51
mid t27 t72 t1 t64 t62 t47 t57 t53 t24 t4
long t5 t68 t47 t17 t68 t63 t33 t52 t73 t79 t10 t11
long t0 t9 t9 t72 t61 t70 t38 t6 t5 t26 t5 t78 t19
short t61 t20 t15
short t48 t25 t41 t21 t4 t69
long t12 t12 t70 t15 t2 t25 t2 t71 t67 t51 t49 t5 t5 t70 t4
mid t46 t8 t49 t8 t13 t16 t3 t61 t6
long t68 t0 t47 t50 t30 t1 t78 t5 t5 t38 t72 t73 t60 t51
mid t52 t66 t26 t13 t63 t3 t19 t63 t71 t21
long t11 t7 t24 t6 t53 t18 t21 t45 t35 t45 t28 t25 t52 t14 t31
short t67 t68 t5 t2
long t3 t12 t47 t18 t8 t60 t0 t77 t11 t51 t27
short t55 t51 t54 t12
long t51 t62 t72 t1 t41 t73 t7 t71 t24 t24 t58 t21 t22 t42
short t48 t71 t44 t60 t64
long t21 t27 t40 t57 t74 t67 t7 t60 t43 t2 t11 t33 t55 t10
long t43 t71 t42 t17 t15 t47 t64 t13 t50 t6 t26 t0 t35 t20 t42
short t46 t1 t31 t20 t73 t7
mid t69 t36 t16 t56 t39 t41 t75 t77 t27 t6
mid t37 t0 t41 t0 t72 t19 t21 t11 t55 t47
long t28 t76 t34 t36 t63 t56 t63 t77 t54 t18 t44
short t47 t28 t74 t69
mid t71 t76 t65 t39 t14 t3 t29 t49 t61 t47
long t51 t30 t65 t61 t70 t45 t24 t53 t6 t53 t7 t4 t3 t26 t76
short t29 t79 t75 t69
long t27 t5 t47 t54 t42 t17 t39 t14 t71 t52 t43 t23 t64 t5 t57
short t38 t11 t28 t17
mid t58 t13 t16 t33 t39 t64 t44 t34
short t68 t11 t36 t56
long t77 t47 t16 t42 t60 t5 t61 t57 t63 t19 t74 t32 t18
long t44 t59 t11 t31 t13 t54 t71 t40 t16 t20 t28 t77 t61
mid t6 t79 t63 t11 t25 t77 t76 t14 t30
long t0 t12 t65 t66 t15 t10 t3 t27 t11 t1 t7 t40 t2
mid t32 t17 t68 t14 t1 t63 t15 t78 t43
long t30 t59 t45 t9 t49 t55 t43 t10 t36 t36 t75 t62 t29
long t75 t55 t20 t27 t33 t73 t49 t79 t39 t31 t33 t9
mid t9 t19 t15 t63 t27 t0 t77 t69
long t12 t1 t16 t34 t20 t59 t8 t54 t39 t6 t50
short t21 t59 t44
long t77 t49 t21 t71 t12 t66 t33 t68 t36 t41 t77 t43 t49 t31 t44
short t30 t8 t26
long t57 t68 t53 t1 t59 t24 t22 t30 t69 t48 t8 t18
long t24 t39 t71 t67 t51 t57 t76 t73 t22 t61 t51 t39 t77 t16
long t53 t8 t31 t4 t16 t18 t22 t19 t30 t33 t4 t56 t16 t15 t60
long t7 t9 t51 t72 t53 t74 t16 t49 t46 t7 t47
long t40 t18 t31 t10 t41 t37 t64 t43 t16 t13 t54
short t19 t73 t57 t62 t27
short t44 t73 t18
short t62 t4 t28
mid t16 t30 t36 t67 t10 t75 t58
short t74 t2 t59
mid t46 t19 t62 t3 t73 t34 t12 t11
mid t52 t44 t58 t37 t6 t9 t67 t26
long t35 t54 t2 t50 t74 t43 t64 t15 t32 t72 t9 t55 t61
long t76 t56 t73 t77 t67 t31 t1 t31 t42 t14 t34
long t61 t32 t60 t0 t72 t38 t25 t79 t60 t66 t68 t16 t28 t51
mid t74 t8 t65 t6 t11 t18 t37
mid t60 t75 t76 t61 t60 t12 t15 t30 t41 t59
long t11 t70 t47 t20 t45 t38 t51 t26 t18 t65 t46 t20 t12 t15 t15
mid t0 t6 t26 t36 t38 t31 t15 t52 t52
mid t2 t44 t14 t37 t38 t58 t46 t57 t26
mid t69 t28 t28 t17 t24 t33 t54
long t28 t67 t9 t50 t41 t32 t60 t57 t27 t46 t28
short t37 t72 t52
mid t63 t13 t9 t79 t70 t27 t4 t75 t53
long t24 t28 t53 t16 t57 t2 t24 t67 t72 t68 t74
long t31 t13 t79 t9 t41 t77 t17 t55 t0 t61 t25 t58 t66 t29
mid t22 t39 t35 t56 t35 t68 t44 t59
long t62 t72 t66 t18 t1 t53 t18 t6 t73 t70 t8 t13 t3 t46 t57
mid t47 t13 t20 t5 t58 t51 t41 t3 t65
mid t27 t74 t67 t1 t40 t31 t50 t19 t65 t27
short t50 t63 t61 t45 t52 t22
mid t77 t78 t16 t21 t40 t42 t57 t78
mid t4 t58 t34 t8 t62 t46 t66 t8 t75 t61
short t9 t15 t35 t74 t35
mid t66 t62 t43 t68 t59 t24 t12 t16 t46
short t51 t40 t29 t49
mid t71 t2 t31 t78 t9 t38 t33
mid t62 t49 t31 t58 t76 t17 t63 t68
short t52 t5 t39
long t23 t46 t74 t7 t54 t20 t46 t48 t63 t58 t56 t44 t65 t44 t8
long t7 t8 t49 t57 t30 t40 t34 t1 t70 t47 t55 t35 t11
long t8 t29 t71 t65 t61 t70 t64 t10 t69 t70 t60 t41 t1
short t51 t74 t51 t45
mid t37 t17 t43 t3 t77 t38 t17
mid t55 t44 t33 t5 t4 t60 t59 t61
mid t29 t20 t43 t56 t14 t40 t15 t38 t46 t65
short t67 t65 t59
short t21 t16 t60 t77 t21 t31
long t63 t25 t26 t15 t19 t2 t30 t2 t66 t54 t45 t12
mid t61 t39 t62 t78 t13 t3 t21
mid t8 t79 t58 t30 t65 t38 t60 t48
mid t17 t14 t17 t21 t39 t12 t12 t59 t75 t5
short t43 t66 t38 t45
long t2 t15 t70 t77 t59 t18 t76 t64 t56 t72 t48 t69 t24
short t74 t78 t10 t65 t73 t62
short t37 t1 t8 t26 t30 t66
short t47 t3 t54 t32 t0
mid t72 t4 t27 t32 t61 t17 t60 t53 t46 t56
mid t25 t78 t63 t31 t47 t70 t25 t58 t15
mid t59 t34 t25 t9 t70 t41 t68 t21
mid t42 t75 t70 t10 t24 t50 t49 t62 t76
mid t0 t77 t39 t74 t15 t10 t79
mid t48 t71 t30 t23 t50 t19 t53 t77 t60
short t40 t74 t37 t77 t62
mid t78 t8 t27 t2 t68 t22 t1
short t64 t63 t63
mid t15 t73 t22 t43 t56 t74 t29
mid t60 t24 t38 t24 t41 t37 t52
short t17 t9 t33 t23
mid t47 t62 t29 t75 t25 t68 t13 t17 t78
long t75 t23 t70 t5 t46 t55 t69 t50 t53 t45 t68 t32 t40 t73 t66
short t23 t11 t57
short t22 t5 t16
mid t15 t13 t30 t43 t6 t74 t25 t79 t50 t4
long t21 t2 t76 t70 t7 t25 t18 t3 t64 t32 t61
long t36 t55 t21 t21 t28 t31 t28 t41 t30 t17 t78 t68 t62 t37
mid t68 t20 t70 t2 t9 t34 t25 t20
short t16 t58 t27
short t77 t53 t36 t57 t72 t74
long t2 t2 t46 t11 t72 t79 t44 t71 t78 t19 t12
mid t51 t11 t78 t4 t11 t42 t67 t49 t68 t58
long t47 t10 t44 t75 t43 t60 t56 t21 t31 t8 t62
short t31 t8 t35
short t17 t18 t18 t40 t37 t14
long t18 t35 t69 t50 t45 t65 t26 t42 t18 t69 t45
short t74 t9 t71 t32 t40
short t28 t37 t76 t69 t15 t50
short t48 t2 t60 t52 t67
short t53 t42 t31
long t76 t31 t44 t70 t53 t55 t65 t70 t67 t44 t16
long t66 t66 t49 t41 t13 t59 t63 t72 t74 t40 t79
short t4 t19 t74 t47
short t26 t7 t67 t20
long t65 t29 t6 t6 t22 t27 t71 t79 t0 t65 t38 t17
long t43 t18 t25 t3 t58 t28 t13 t78 t76 t9 t38 t55 t39
long t25 t56 t0 t50 t57 t65 t33 t59 t46 t23 t35 t3 t72 t71
mid t57 t15 t76 t65 t40 t77 t29
long t40 t33 t44 t51 t18 t32 t9 t21 t43 t52 t63 t12
mid t72 t51 t10 t22 t57 t50 t17 t10
short t15 t49 t50
mid t25 t56 t40 t41 t32 t51 t31
mid t23 t1 t63 t22 t15 t44 t32
short t2 t61 t71 t61
mid t55 t43 t12 t75 t6 t11 t0
long t69 t67 t38 t71 t20 t17 t13 t18 t55 t18 t42 t44 t51 t28
short t32 t28 t74 t69 t31 t2
mid t1 t59 t39 t18 t72 t24 t26 t40
mid t19 t73 t45 t31 t19 t7 t49 t35 t20 t4
mid t13 t42 t36 t62 t36 t58 t78 t65
short t67 t27 t10
long t17 t19 t63 t41 t24 t73 t4 t79 t20 t64 t65 t65 t69 t78 t25
long t53 t1 t24 t56 t10 t53 t50 t51 t4 t53 t35 t33 t45 t19
long t70 t59 t63 t60 t27 t75 t42 t39 t31 t5 t22 t70 t4 t66 t7
mid t43 t66 t0 t43 t56 t29 t19 t29 t69 t41
mid t11 t22 t22 t4 t39 t10 t4 t43 t66
short t0 t39 t18 t68 t33 t11
short t72 t21 t24
short t29 t7 t60
long t31 t4 t13 t79 t31 t20 t13 t16 t47 t73 t5 t37 t47 t32
mid t74 t48 t63 t78 t59 t14 t29 t29
mid t38 t68 t9 t77 t64 t55 t65 t79
short t57 t14 t15 t31 t25
long t16 t20 t76 t0 t11 t0 t38 t59 t34 t48 t60
long t37 t52 t65 t14 t43 t6 t46 t70 t72 t52 t77 t17
short t4 t40 t11
long t75 t44 t42 t19 t76 t70 t66 t6 t70 t20 t34 t19
long t53 t12 t14 t73 t66 t14 t42 t73 t18 t4 t25 t32 t52 t70 t58
long t1 t6 t16 t35 t12 t72 t28 t15 t14 t70 t75
short t70 t45 t59 t63 t24
long t23 t60 t41 t12 t0 t32 t24 t7 t77 t32 t40 t46
long t47 t5 t55 t52 t60 t66 t30 t76 t1 t63 t16 t32 t11
long t3 t53 t27 t63 t63 t79 t37 t4 t44 t25 t24
short t16 t6 t6
short t67 t61 t43
long t57 t2 t62 t18 t3 t0 t31 t21 t30 t52 t71 t13 t28 t37 t79
short t18 t10 t2 t27 t44
mid t53 t14 t49 t61 t40 t52 t11 t15 t63 t51
short t23 t6 t15 t52 t11
short t73 t27 t33 t8 t72
long t28 t31 t29 t37 t45 t75 t21 t16 t40 t73 t60 t79 t74 t63
mid t39 t50 t18 t40 t8 t78 t12
long t48 t69 t10 t12 t55 t53 t27 t50 t33 t9 t20 t63 t71 t67
long t48 t73 t74 t52 t19 t71 t44 t79 t58 t51 t71
mid t50 t70 t45 t58 t54 t24 t76 t26
long t13 t13 t76 t66 t67 t20 t69 t22 t52 t42 t13 t10 t77 t30 t23
mid t62 t12 t22 t79 t32 t8 t7 t31 t59 t3
long t7 t79 t74 t57 t21 t50 t60 t78 t57 t73 t17 t41 t44 t58 t10
short t14 t50 t66 t43 t27
long t44 t19 t44 t29 t39 t29 t56 t3 t12 t28 t7 t1 t55
long t58 t60 t64 t59 t52 t20 t59 t39 t24 t30 t9 t79 t34 t43
short t40 t64 t27
mid t39 t48 t7 t43 t44 t49 t48
short t20 t23 t13 t67 t71
mid t7 t42 t5 t35 t34 t66 t12
long t60 t1 t38 t74 t5 t73 t49 t23 t52 t17 t34 t71
long t26 t54 t76 t27 t59 t79 t48 t63 t74 t65 t48 t44 t39
long t77 t12 t19 t77 t45 t33 t15 t12 t41 t24 t47 t78 t71 t9
short t24 t7 t23
short t47 t73 t72 t40 t8 t0
short t49 t74 t42
mid t21 t60 t7 t78 t73 t24 t43 t79 t48 t9
mid t56 t15 t14 t76 t47 t44 t79 t31 t56 t36
mid t56 t56 t34 t65 t19 t33 t63 t59
short t64 t48 t27 t72 t64 t35
long t44 t41 t47 t38 t21 t27 t69 t38 t26 t25 t20 t11 t6 t77 t74
mid t47 t57 t17 t39 t67 t10 t55 t39 t25
mid t10 t69 t47 t71 t67 t26 t51 t56 t3 t59
mid t4 t13 t12 t78 t71 t41 t71
short t43 t79 t47 t20 t45 t71
short t2 t9 t22 t47 t9 t21
short t69 t19 t46
long t70 t76 t47 t8 t3 t5 t56 t30 t34 t6 t24 t74 t15
mid t46 t79 t75 t72 t12 t70 t59
long t14 t44 t30 t11 t27 t21 t28 t9 t53 t16 t1 t12
long t49 t77 t7 t70 t4 t18 t21 t10 t31 t18 t45 t20
short t53 t79 t70 t27
short t18 t55 t31 t59 t77 t52
long t27 t19 t6 t72 t34 t39 t68 t53 t49 t39 t10 t32 t36 t72 t4
mid t10 t29 t7 t17 t2 t3 t30 t26 t57 t72
mid t14 t2 t74 t31 t48 t10 t1 t57
short t57 t55 t33
short t48 t60 t42 t56
long t34 t60 t17 t35 t77 t71 t27 t0 t64 t42 t53 t78 t35
short t35 t78 t47
long t22 t74 t20 t66 t41 t69 t36 t35 t61 t19 t51 t42
short t51 t19 t7
long t8 t52 t18 t39 t74 t73 t37 t50 t59 t66 t21 t74 t4 t26 t57
short t11 t40 t38 t13 t52 t58
mid t22 t11 t19 t22 t62 t57 t11 t79 t58
short t55 t36 t74 t33 t40 t54
short t8 t34 t74 t69 t14 t36
long t55 t20 t18 t58 t76 t42 t66 t46 t21 t71 t41 t55
mid t68 t73 t66 t5 t41 t67 t60
long t5 t40 t26 t33 t54 t56 t79 t72 t2 t1 t79 t53 t11
mid t38 t11 t13 t45 t16 t37 t20 t77 t60
mid t68 t18 t29 t68 t75 t19 t68 t30 t19 t17
mid t28 t36 t30 t43 t64 t63 t30 t17 t8
short t31 t40 t59 t39
long t7 t70 t53 t37 t72 t50 t21 t7 t52 t70 t67 t40 t10
mid t61 t46 t0 t52 t79 t26 t39 t41 t28 t49
mid t67 t70 t76 t1 t47 t77 t73 t2
short t26 t28 t32
mid t67 t58 t10 t49 t11 t13 t74 t6
long t40 t32 t31 t75 t6 t52 t18 t56 t51 t38 t69 t5 t30 t67
long t4 t47 t47 t25 t40 t43 t74 t42 t70 t34 t10 t63 t18 t58
long t27 t53 t48 t23 t70 t78 t47 t67 t67 t79 t33
mid t4 t66 t37 t13 t48 t13 t62 t57 t15 t23
mid t2 t58 t37 t63 t5 t26 t63 t62 t53
short t17 t61 t71 t35 t63 t19
short t45 t43 t66 t76
mid t77 t23 t17 t67 t1 t55 t17
mid t50 t11 t27 t25 t52 t29 t5 t13
long t14 t20 t55 t57 t74 t29 t47 t49 t38 t49 t10
short t55 t51 t45
long t12 t38 t42 t70 t12 t66 t12 t33 t69 t77 t58 t57
long t61 t74 t6 t25 t61 t66 t75 t32 t40 t5 t12 t24 t65 t78
mid t39 t0 t37 t16 t46 t66 t73 t8
long t73 t11 t25 t69 t0 t49 t40 t51 t73 t11 t28
long t31 t76 t52 t68 t73 t34 t78 t58 t79 t53 t46
long t19 t22 t0 t60 t77 t49 t49 t9 t17 t60 t15 t19 t54 t8
mid t71 t70 t28 t4 t77 t23 t35 t70 t46 t5
long t66 t34 t0 t49 t43 t46 t50 t28 t69 t71 t58 t32
long t35 t40 t13 t59 t25 t19 t52 t22 t24 t78 t79 t33 t36 t72
mid t1 t16 t41 t16 t72 t20 t28 t53
long t76 t55 t39 t63 t13 t25 t37 t66 t60 t11 t56
long t79 t67 t3 t22 t41 t8 t4 t15 t76 t17 t1 t27 t70 t15 t62
short t13 t63 t44 t71 t34 t25
long t54 t76 t51 t56 t10 t45 t73 t9 t37 t11 t38 t78 t2 t32 t59
mid t22 t15 t14 t47 t46 t28 t33 t65
long t1 t39 t51 t43 t56 t20 t43 t57 t60 t11 t46
mid t25 t3 t5 t18 t19 t9 t37
mid t68 t65 t48 t49 t51 t61 t57 t14 t78 t76
long t76 t5 t63 t12 t72 t77 t23 t4 t45 t41 t29 t23 t76
long t68 t19 t26 t20 t6 t1 t11 t14 t64 t54 t24 t3 t1 t41
short t25 t69 t43 t19 t61
mid t64 t40 t70 t19 t50 t77 t78 t47 t8
long t61 t27 t44 t21 t70 t15 t49 t64 t55 t70 t53 t16 t55 t30 t31
long t10 t70 t78 t52 t1 t60 t76 t73 t70 t49 t42
mid t79 t76 t13 t25 t16 t58 t45 t10 t64
long t75 t49 t56 t45 t0 t38 t55 t40 t21 t6 t38
mid t9 t77 t61 t24 t32 t20 t28 t1 t1
mid t62 t63 t60 t49 t4 t59 t54 t24 t41
short t75 t61 t25
long t17 t64 t71 t3 t6 t31 t69 t15 t15 t75 t5 t42
long t61 t47 t75 t53 t32 t11 t24 t52 t39 t57 t34
short t44 t41 t71 t17 t71 t62
mid t31 t10 t25 t27 t79 t40 t47 t59
long t33 t42 t77 t62 t61 t58 t20 t14 t63 t32 t10 t19 t62 t44
mid t59 t66 t74 t50 t43 t50 t72
long t74 t10 t50 t7 t28 t10 t54 t64 t55 t36 t61 t54
short t42 t61 t39
mid t78 t69 t72 t12 t42 t67 t76 t44 t20
short t31 t74 t6 t11
long t56 t33 t63 t5 t16 t69 t71 t60 t46 t70 t34 t56
long t39 t27 t20 t21 t18 t57 t74 t44 t27 t36 t41 t4 t20
long t39 t2 t48 t47 t72 t64 t49 t9 t71 t63 t13 t51 t78 t74
short t3 t7 t36 t77 t18 t23
short t33 t2 t3
long t53 t8 t65 t17 t52 t23 t75 t70 t61 t75 t19
long t42 t65 t41 t55 t51 t1 t75 t36 t8 t58 t41 t24 t46 t1 t78
short t43 t37 t26 t34 t35 t70
long t9 t48 t54 t44 t13 t72 t23 t29 t17 t9 t51 t73
mid t24 t33 t30 t15 t74 t32 t41 t56
long t37 t33 t7 t9 t62 t31 t4 t3 t72 t38 t6 t9 t73
mid t6 t20 t27 t64 t79 t40 t27 t69 t40
long t50 t7 t43 t29 t49 t32 t17 t51 t69 t74 t1
short t17 t27 t65
short t77 t0 t34
long t64 t56 t25 t24 t7 t58 t60 t11 t68 t14 t68 t73 t16 t47
mid t36 t24 t33 t25 t6 t66 t30
short t26 t63 t55
long t33 t1 t21 t44 t19 t58 t71 t47 t13 t45 t72 t52 t23 t56 t50
mid t69 t25 t77 t59 t35 t6 t16 t66 t57 t33
long t64 t29 t72 t31 t19 t12 t64 t23 t41 t34 t55 t63 t11 t6
long t22 t25 t6 t22 t35 t19 t10 t65 t7 t30 t72 t76 t18 t69
mid t71 t32 t10 t52 t74 t79 t63
mid t62 t53 t65 t73 t9 t5 t66
short t61 t43 t19 t0 t56 t12
mid t13 t3 t25 t70 t9 t62 t31 t42
short t23 t35 t22 t1
long t20 t39 t0 t38 t26 t23 t72 t17 t24 t11 t49 t16
long t34 t50 t1 t18 t66 t17 t56 t27 t12 t17 t32 t29 t59
long t18 t71 t5 t32 t0 t34 t30 t63 t64 t74 t75
short t77 t38 t58 t30 t51
long t27 t21 t10 t69 t62 t79 t46 t70 t70 t64 t25 t18 t68 t36
long t59 t64 t77 t9 t43 t59 t17 t9 t46 t2 t35 t35 t57 t44
mid t41 t79 t11 t8 t21 t12 t60 t51 t74
short t17 t42 t46
short t50 t66 t78
short t1 t24 t2 t22
long t31 t14 t12 t18 t63 t7 t70 t50 t74 t51 t24 t43 t58
mid t47 t21 t36 t8 t69 t71 t44 t24 t65 t63
mid t30 t21 t34 t42 t58 t74 t26 t20
mid t16 t29 t69 t51 t30 t28 t14 t60 t39
short t68 t76 t71
long t49 t57 t36 t42 t13 t73 t25 t0 t16 t50 t39 t72 t44 t66 t45
mid t47 t18 t31 t41 t50 t70 t69 t18 t41 t57
mid t37 t5 t2 t61 t50 t29 t50 t19 t17
short t30 t75 t34 t78
long t46 t47 t54 t0 t16 t13 t58 t64 t44 t76 t44
mid t62 t43 t16 t65 t21 t65 t45
long t15 t54 t1 t71 t51 t58 t8 t55 t53 t73 t52 t74 t15 t42
short t37 t37 t7
short t19 t52 t37
long t48 t22 t33 t2 t2 t28 t37 t41 t44 t70 t78 t13 t48 t74 t43
long t24 t18 t65 t59 t61 t22 t71 t2 t49 t28 t49 t59 t74 t66
long t48 t43 t75 t66 t45 t58 t40 t36 t7 t48 t0 t31
mid t20 t79 t52 t66 t18 t56 t45
long t56 t48 t45 t66 t62 t7 t36 t35 t64 t30 t69
short t6 t29 t66
short t30 t70 t70 t72 t4
mid t43 t4 t13 t55 t56 t29 t14 t29 t12
mid t42 t63 t23 t15 t55 t51 t76 t56 t54
mid t7 t22 t77 t38 t70 t50 t11 t33
mid t20 t59 t40 t58 t60 t25 t35
mid t73 t1 t66 t52 t52 t29 t3 t14
long t30 t60 t41 t55 t52 t60 t47 t32 t33 t67 t25 t8
short t48 t49 t60 t43
long t22 t5 t36 t61 t71 t31 t75 t53 t42 t14 t60 t43 t75 t64 t47
mid t42 t49 t2 t0 t76 t39 t58 t61 t48
long t3 t74 t55 t46 t70 t76 t24 t71 t73 t75 t56 t67 t8 t12
short t79 t16 t25 t22 t37
mid t52 t44 t52 t55 t25 t58 t68 t22
long t17 t5 t15 t44 t75 t42 t77 t13 t44 t6 t58 t12 t37
short t30 t49 t62
long t44 t11 t75 t2 t66 t5 t32 t57 t40 t77 t57
long t4 t16 t47 t33 t44 t63 t32 t15 t61 t17 t65 t29 t37 t26
long t22 t52 t2 t55 t27 t55 t7 t1 t16 t21 t74 t60 t33 t45
mid t9 t77 t21 t46 t38 t50 t9 t77
mid t34 t49 t75 t76 t35 t13 t34 t38 t8 t33
mid t30 t62 t39 t21 t22 t10 t28 t4 t9
short t33 t60 t45 t17 t38 t28
mid t31 t53 t49 t6 t52 t59 t2 t78 t75 t28
short t66 t61 t9 t66
mid t76 t25 t2 t26 t36 t36 t73
short t23 t49 t32 t48
mid t0 t21 t48 t52 t68 t28 t28 t13
short t9 t61 t76 t73 t66
mid t12 t13 t57 t65 t38 t70 t67 t39 t36
mid t49 t11 t59 t38 t69 t32 t6
mid t50 t40 t47 t28 t13 t73 t65 t42 t34 t21
short t1 t31 t26 t69 t42 t4
long t36 t62 t13 t59 t3 t38 t42 t45 t45 t65 t58
long t62 t42 t44 t30 t2 t76 t73 t30 t32 t27 t13 t69 t42
long t14 t59 t41 t64 t16 t8 t35 t56 t7 t19 t21 t14 t7 t43
mid t21 t9 t3 t32 t76 t12 t16 t67 t17 t46
mid t59 t50 t72 t50 t74 t12 t43 t34 t5 t29
mid t46 t33 t51 t25 t74 t76 t39 t68 t34 t12
short t60 t1 t15 t65
mid t17 t78 t37 t23 t47 t50 t60 t49 t29 t20
mid t79 t25 t1 t33 t38 t46 t61 t65 t74 t66
mid t28 t2 t15 t54 t39 t50 t71
long t45 t8 t50 t78 t35 t6 t36 t47 t12 t35 t46 t70 t36
long t35 t43 t24 t27 t38 t69 t38 t47 t60 t62 t35 t17
mid t23 t58 t42 t6 t18 t0 t51 t23 t47
mid t16 t29 t58 t62 t17 t33 t46 t21 t56 t75
mid t65 t27 t67 t54 t43 t58 t20 t75 t27 t21
mid t46 t69 t61 t23 t60 t5 t72
short t75 t58 t29 t48 t63
long t74 t12 t16 t49 t70 t18 t24 t17 t71 t36 t26 t3 t33 t63
mid t74 t74 t57 t65 t61 t34 t44 t73 t35
long t6 t61 t70 t0 t42 t5 t56 t21 t55 t37 t52 t64
mid t77 t63 t49 t68 t67 t36 t9
mid t23 t3 t29 t38 t79 t61 t41
short t58 t18 t28 t42
long t36 t4 t75 t12 t76 t17 t2 t70 t35 t73 t54 t69 t0 t2 t11
long t10 t34 t64 t17 t62 t39 t78 t13 t14 t22 t37
long t73 t60 t4 t26 t11 t50 t2 t20 t0 t34 t29 t28 t13
short t60 t13 t20
short t17 t71 t66 t36
long t41 t16 t10 t47 t32 t10 t67 t56 t43 t74 t50 t39 t76 t46 t57
mid t20 t39 t15 t46 t70 t53 t36 t68
long t46 t5 t15 t32 t36 t0 t9 t21 t49 t69 t8 t59 t42
long t72 t20 t1 t66 t70 t11 t66 t62 t1 t58 t50 t31
short t13 t46 t33 t42
short t67 t64 t6 t31 t50
long t45 t27 t10 t75 t13 t65 t6 t2 t60 t67 t42 t40 t28 t10
short t8 t57 t37 t45
long t79 t0 t30 t34 t46 t48 t20 t73 t59 t59 t72 t65 t72
short t56 t56 t1 t44 t10 t51
long t40 t30 t38 t29 t26 t21 t67 t56 t36 t30 t63 t54
mid t42 t4 t76 t54 t57 t70 t11 t28
long t14 t75 t56 t41 t57 t23 t13 t45 t33 t15 t5 t72 t50 t76 t48
short t14 t72 t0 t31 t66
short t16 t0 t1 t46 t65 t43
long t55 t31 t60 t63 t4 t20 t75 t7 t20 t14 t30 t61 t25 t69
mid t8 t41 t12 t46 t50 t67 t59 t23 t22 t67
long t46 t65 t21 t45 t0 t35 t29 t32 t66 t35 t64 t32
long t51 t54 t14 t22 t75 t41 t3 t77 t41 t7 t3 t49 t75
short t4 t30 t49
short t9 t48 t63 t61
short t40 t39 t25 t45 t47 t1
long t61 t7 t13 t77 t6 t69 t42 t63 t48 t0 t1 t31 t14 t3
long t29 t54 t22 t78 t63 t4 t10 t24 t31 t22 t11 t51 t24 t20
short t11 t62 t33 t20 t46 t61
short t59 t11 t27 t5
short t36 t7 t12
long t52 t3 t21 t55 t68 t42 t63 t30 t78 t4 t58 t45 t60 t40
long t65 t61 t8 t76 t22 t72 t55 t26 t35 t14 t8 t6
short t4 t37 t35 t74 t12 t77
mid t19 t73 t43 t69 t45 t34 t50 t58 t34
mid t9 t4 t56 t12 t74 t71 t15 t7
short t44 t15 t70 t22 t42
long t7 t5 t72 t61 t26 t59 t12 t8 t7 t41 t46 t27 t77
long t60 t75 t56 t38 t34 t24 t57 t26 t15 t51 t70 t12 t28 t53
long t41 t19 t34 t24 t13 t14 t51 t0 t71 t62 t39 t5 t22 t4 t4
long t41 t64 t7 t38 t22 t15 t25 t30 t18 t16 t12
long t11 t49 t67 t64 t74 t41 t68 t74 t16 t48 t70
long t59 t17 t12 t27 t43 t54 t12 t38 t79 t31 t65
short t44 t23 t44 t0 t21
mid t28 t3 t30 t33 t77 t24 t1
long t26 t23 t39 t45 t23 t26 t45 t44 t73 t34 t40 t33
short t3 t62 t54 t70 t58 t27
long t78 t19 t75 t41 t8 t7 t34 t69 t71 t55 t44 t2
long t69 t21 t56 t76 t77 t41 t0 t39 t59 t4 t76
short t18 t66 t75 t70
mid t4 t39 t60 t8 t11 t15 t73 t51
mid t13 t14 t60 t19 t75 t79 t68 t60
mid t30 t4 t48 t2 t31 t54 t19 t48 t20
short t16 t37 t59
short t14 t29 t42 t27
long t38 t47 t58 t62 t71 t51 t77 t74 t14 t3 t29 t23 t9 t66
short t9 t58 t74 t1
short t57 t39 t1 t51 t42 t0
short t67 t63 t62 t57 t65 t32
long t76 t1 t55 t22 t62 t52 t38 t7 t31 t57 t49
short t18 t24 t66 t75 t9
long t2 t34 t36 t35 t20 t78 t0 t18 t17 t60 t46 t71 t4 t56 t45
mid t19 t14 t41 t4 t6 t11 t61 t21 t18
mid t44 t25 t27 t32 t73 t15 t58 t3
long t33 t41 t36 t13 t20 t12 t65 t51 t77 t35 t13 t8 t15 t45
short t21 t30 t49 t72 t24 t59
long t18 t78 t62 t59 t2 t8 t14 t32 t25 t69 t76
long t54 t59 t33 t6 t64 t54 t2 t51 t28 t35 t27 t21 t23
short t8 t2 t78 t31 t66
mid t42 t37 t65 t71 t0 t78 t28 t22
short t40 t2 t74
short t61 t18 t17 t20 t65
short t62 t78 t51 t61 t4 t50
long t0 t26 t73 t19 t33 t39 t35 t71 t29 t58 t24 t10
short t21 t17 t18 t1 t12 t36
long t57 t26 t7 t31 t0 t77 t28 t67 t3 t36 t14 t21 t24 t66
long t35 t6 t27 t2 t13 t61 t71 t5 t71 t55 t36
long t41 t12 t1 t77 t49 t68 t66 t65 t2 t38 t66 t47 t78 t48 t11
long t46 t77 t72 t47 t43 t56 t23 t43 t63 t78 t31 t34 t33 t58
short t75 t54 t31 t66 t76
long t7 t76 t38 t54 t14 t53 t28 t6 t24 t71 t16 t51 t8 t9
long t37 t74 t20 t1 t69 t72 t5 t48 t41 t64 t41 t30
mid t34 t5 t48 t44 t2 t53 t77 t39 t61 t25
long t34 t60 t6 t40 t73 t70 t45 t15 t61 t26 t73 t25
short t1 t30 t71 t65 t67
short t73 t26 t57 t65 t36
short t17 t79 t68 t31 t12 t49
short t76 t48 t11 t29 t12 t25
short t34 t11 t36 t27 t69 t29
mid t41 t3 t71 t45 t69 t56 t22
mid t23 t38 t68 t22 t52 t37 t59
long t79 t60 t60 t36 t31 t36 t69 t34 t46 t78 t18 t56
mid t38 t15 t31 t23 t65 t20 t8 t68 t47 t9
short t13 t30 t56 t27 t32 t9
short t60 t13 t30
mid t41 t48 t34 t62 t73 t33 t5
long t55 t36 t74 t18 t78 t52 t47 t12 t55 t40 t26
mid t12 t29 t63 t45 t39 t71 t51
mid t29 t67 t30 t64 t6 t58 t62 t52 t49
short t24 t68 t31 t37 t70
short t10 t58 t21 t69 t52 t20
short t42 t12 t54 t60 t39 t79
long t30 t20 t4 t48 t1 t46 t36 t46 t56 t54 t51 t79 t63 t20 t58
short t31 t4 t0 t55
long t42 t78 t39 t51 t0 t35 t76 t8 t79 t64 t22 t4 t26
long t51 t48 t24 t59 t55 t40 t25 t53 t16 t26 t52
long t30 t20 t12 t27 t54 t19 t69 t79 t14 t16 t30 t50 t3
short t54 t19 t0 t79
long t48 t52 t48 t59 t42 t20 t3 t79 t12 t30 t71 t12 t76 t4
mid t28 t1 t65 t56 t23 t24 t62
mid t73 t51 t18 t12 t34 t5 t30 t31 t36
long t69 t21 t7 t61 t58 t78 t32 t51 t51 t68 t42 t48
mid t42 t62 t63 t68 t39 t38 t0
short t37 t45 t67
short t42 t48 t56 t35 t2
long t48 t13 t32 t1 t28 t0 t61 t20 t14 t68 t7 t54 t79 t9 t63
short t53 t39 t56 t24 t7
long t11 t11 t70 t47 t50 t73 t70 t33 t32 t73 t0 t22
mid t18 t1 t16 t35 t71 t79 t11 t14 t57
long t71 t65 t28 t54 t0 t39 t42 t72 t35 t12 t54 t77 t67 t58
long t29 t38 t15 t2 t77 t9 t50 t78 t3 t24 t74 t32 t38 t30 t43
long t26 t2 t70 t57 t8 t36 t42 t2 t55 t3 t34 t62
short t18 t21 t40 t52 t34
mid t67 t34 t47 t28 t17 t71 t76
long t34 t12 t63 t79 t51 t21 t0 t59 t79 t73 t0 t51 t43 t36 t0
mid t64 t45 t70 t40 t79 t75 t19
long t27 t67 t65 t52 t41 t66 t0 t56 t44 t69 t67 t32 t8 t33 t57
long t15 t46 t15 t23 t61 t55 t73 t18 t77 t29 t13 t20 t61 t53 t59
short t78 t68 t22 t35 t53 t63
short t76 t26 t40
short t14 t5 t34 t40 t50
long t41 t46 t3 t21 t79 t74 t29 t71 t30 t39 t67
long t25 t6 t75 t46 t60 t12 t23 t65 t10 t65 t40 t14 t49 t11 t69
mid t43 t40 t67 t5 t77 t9 t73 t77
short t49 t59 t9 t53 t18 t73
short t4 t44 t55 t1 t2 t38
mid t60 t57 t53 t19 t49 t8 t68
mid t11 t46 t30 t65 t7 t56 t20
mid t46 t33 t55 t75 t33 t53 t13 t11
long t11 t20 t4 t1 t66 t24 t57 t48 t46 t70 t78
short t55 t79 t8 t73 t69 t53
mid t53 t45 t62 t66 t63 t42 t39 t38 t45
mid t16 t57 t31 t28 t7 t5 t0 t66
short t39 t35 t26
short t59 t65 t71 t22 t37
mid t26 t62 t77 t51 t51 t0 t67 t34 t25 t77
long t29 t6 t50 t33 t46 t48 t55 t19 t1 t71 t58 t64 t4
mid t59 t8 t62 t21 t57 t37 t35 t58
long t38 t10 t61 t13 t60 t8 t63 t11 t14 t55 t58 t29 t46
short t35 t51 t37 t7 t10
long t66 t63 t36 t66 t55 t26 t49 t44 t77 t42 t4 t41 t62 t77 t76
long t58 t18 t59 t11 t44 t34 t36 t72 t54 t8 t9 t61 t74 t21
mid t45 t22 t31 t9 t47 t70 t17 t62 t48
short t6 t71 t28 t57 t30 t0
mid t13 t3 t65 t59 t9 t48 t61
long t70 t5 t7 t0 t35 t67 t7 t41 t52 t1 t69 t34 t39 t0
short t14 t40 t4 t50 t13
long t51 t55 t16 t50 t24 t42 t42 t18 t65 t14 t21
mid t38 t15 t58 t33 t4 t3 t63 t58 t69
long t4 t24 t3 t8 t53 t64 t47 t17 t28 t36 t60 t15
long t49 t0 t42 t72 t18 t76 t1 t69 t25 t28 t45 t16 t20
mid t61 t61 t11 t0 t39 t12 t67
long t49 t70 t77 t15 t45 t16 t21 t11 t78 t18 t17 t0 t45 t67
mid t18 t21 t2 t76 t59 t36 t48
mid t42 t13 t16 t67 t38 t57 t26 t71 t69 t68
short t52 t9 t46 t66
long t16 t46 t2 t34 t76 t53 t5 t19 t73 t25 t52 t23
long t41 t73 t36 t59 t28 t68 t45 t49 t2 t46 t46 t28
short t54 t69 t43 t35
long t46 t59 t5 t32 t25 t13 t1 t24 t29 t27 t7
long t65 t33 t10 t75 t24 t32 t8 t10 t20 t56 t10 t54 t6 t64 t59
short t66 t12 t42 t37 t8
short t25 t46 t53 t9 t72 t74
mid t52 t35 t78 t50 t79 t77 t68 t18 t48 t3
long t57 t61 t66 t78 t22 t78 t0 t2 t24 t7 t66
mid t30 t69 t28 t76 t0 t67 t30 t49 t4
mid t68 t12 t51 t44 t36 t69 t50 t22
long t32 t66 t43 t62 t69 t78 t21 t55 t63 t18 t35
long t25 t54 t32 t21 t37 t63 t74 t8 t54 t65 t48 t6 t3 t71
mid t31 t15 t48 t27 t36 t74 t31
short t40 t26 t28 t22 t63
long t37 t37 t73 t7 t46 t25 t11 t12 t58 t50 t32 t72 t30
mid t38 t59 t26 t66 t19 t15 t12 t12
mid t59 t11 t8 t37 t78 t51 t25 t22 t59 t30
mid t32 t19 t22 t66 t49 t52 t61
long t75 t27 t44 t23 t14 t39 t15 t73 t2 t37 t73 t6 t20 t59
long t27 t16 t75 t18 t28 t31 t61 t20 t60 t46 t20
long t21 t36 t3 t39 t37 t38 t30 t15 t12 t22 t8 t71 t79 t22
long t61 t79 t74 t76 t21 t16 t58 t23 t72 t1 t11 t43
short t43 t64 t25 t48
long t79 t77 t38 t19 t51 t16 t28 t61 t13 t54 t44 t77 t3 t49
long t41 t55 t39 t77 t58 t19 t9 t21 t6 t63 t68 t22 t54 t2
long t17 t23 t11 t2 t7 t62 t27 t55 t60 t3 t37 t29
short t74 t13 t15 t55 t53
short t71 t43 t54 t9 t24 t45
mid t36 t51 t45 t73 t4 t63 t77 t52 t58
mid t21 t55 t60 t7 t58 t19 t50
mid t22 t33 t38 t39 t47 t43 t27 t76
short t62 t6 t31 t10
short t69 t65 t54 t5 t58
mid t36 t7 t76 t36 t56 t17 t0 t23
long t38 t54 t50 t27 t49 t44 t51 t19 t68 t6 t38 t15
mid t10 t31 t29 t9 t49 t15 t71 t70 t17 t33
short t19 t61 t20
short t13 t60 t12
long t39 t53 t63 t7 t60 t38 t21 t19 t45 t26 t56 t16 t14 t69 t37
short t67 t68 t64 t66
long t14 t37 t51 t3 t61 t4 t70 t35 t61 t51 t63 t51 t18
long t7 t2 t29 t45 t53 t55 t43 t2 t26 t6 t66 t41 t29 t33 t9
mid t24 t11 t78 t23 t19 t78 t72 t58
long t27 t47 t56 t21 t52 t5 t7 t45 t59 t51 t54 t78 t48 t30
long t22 t57 t32 t6 t19 t67 t46 t2 t5 t69 t68 t55
short t12 t21 t36
long t68 t38 t19 t57 t16 t23 t26 t76 t50 t44 t21 t44 t55
long t14 t63 t71 t30 t57 t73 t61 t56 t37 t23 t9 t29
long t43 t59 t68 t7 t7 t53 t35 t31 t74 t5 t22 t36 t73 t69
short t48 t26 t35 t37
long t55 t65 t43 t34 t62 t47 t24 t47 t65 t32 t31
short t74 t49 t77 t28 t8
long t50 t79 t5 t75 t13 t21 t11 t37 t24 t53 t26 t34 t78 t26
mid t58 t22 t37 t15 t64 t67 t68 t37 t11 t68
short t34 t28 t2
short t16 t29 t16 t53 t65 t42
long t34 t5 t4 t28 t73 t31 t27 t47 t25 t50 t55 t43 t71 t15 t30
long t20 t75 t17 t67 t51 t50 t52 t61 t19 t63 t39 t48
long t66 t34 t43 t41 t19 t32 t24 t77 t54 t2 t24 t42 t15
long t58 t78 t22 t11 t65 t7 t21 t61 t60 t40 t10 t59 t6 t25 t74
long t21 t12 t53 t76 t49 t12 t58 t11 t69 t68 t22
mid t34 t78 t24 t74 t76 t38 t78 t7 t5
long t71 t17 t37 t13 t37 t69 t39 t29 t46 t39 t43 t27
short t30 t46 t21
short t25 t39 t25 t45 t17 t68
short t51 t18 t45 t65 t52
long t40 t16 t20 t79 t60 t23 t74 t71 t52 t51 t30
mid t35 t43 t78 t62 t52 t24 t54 t46 t19
short t66 t10 t28 t40 t13
long t40 t1 t48 t11 t55 t43 t24 t42 t39 t2 t21 t5
long t54 t21 t38 t67 t13 t65 t37 t53 t32 t61 t66 t42 t11 t28
short t26 t49 t49
long t57 t47 t47 t67 t58 t29 t56 t39 t65 t6 t37 t63 t9 t9 t60
long t25 t65 t71 t39 t54 t28 t15 t10 t14 t19 t65 t4 t21
long t30 t61 t60 t10 t57 t55 t78 t65 t15 t48 t16 t20 t40 t74
mid t60 t31 t48 t15 t68 t10 t78 t77
long t47 t12 t8 t15 t44 t55 t20 t11 t44 t64 t16 t19
short t53 t14 t58 t33 t12
short t75 t26 t12 t76 t16
mid t79 t43 t0 t75 t50 t71 t64 t70 t63
mid t22 t12 t55 t47 t12 t46 t78 t58 t57 t20
long t49 t49 t52 t61 t26 t10 t25 t54 t44 t66 t75 t40 t76 t56 t66
long t31 t52 t64 t71 t64 t33 t49 t71 t21 t26 t20 t51
mid t20 t38 t44 t12 t62 t64 t31
long t67 t19 t64 t57 t41 t54 t77 t15 t22 t10 t31 t31 t54
mid t1 t61 t76 t57 t38 t5 t25 t16 t47
short t46 t74 t10 t23 t70
short t3 t59 t60 t57
mid t9 t65 t12 t17 t36 t41 t53 t61 t64 t67
long t65 t37 t10 t78 t70 t75 t75 t69 t3 t75 t5 t68
short t31 t44 t30 t32 t55
long t77 t26 t77 t24 t54 t23 t57 t41 t18 t42 t3 t68 t8 t55 t2
long t27 t31 t59 t76 t28 t36 t29 t35 t51 t25 t24 t13 t13 t51 t53
long t77 t26 t13 t71 t16 t5 t1 t76 t53 t17 t46 t50 t58 t73 t63
short t22 t0 t60 t45
short t8 t0 t50 t32 t26 t66
long t70 t63 t55 t70 t18 t9 t35 t38 t15 t50 t25 t40 t2
long t68 t55 t47 t15 t8 t55 t78 t27 t11 t54 t23
mid t41 t23 t43 t6 t42 t35 t26 t13 t79
mid t79 t58 t71 t29 t64 t12 t59 t64 t23
short t17 t74 t4 t67
mid t2 t64 t23 t71 t60 t47 t4
short t1 t61 t35 t59
short t34 t17 t33 t78 t10 t26
mid t62 t73 t6 t12 t45 t56 t12 t25 t39 t69
long t9 t2 t50 t69 t72 t37 t54 t17 t41 t28 t29 t73 t55
mid t77 t0 t40 t44 t27 t60 t53
short t52 t29 t19
long t39 t31 t67 t38 t16 t50 t76 t44 t17 t18 t77 t14 t60 t20
short t4 t32 t56
long t22 t55 t15 t75 t66 t54 t24 t46 t69 t1 t0 t31 t29 t12
mid t78 t32 t21 t31 t35 t60 t57 t18
mid t32 t74 t61 t75 t45 t4 t75 t78 t62
short t10 t64 t14 t13 t30
mid t21 t63 t50 t54 t6 t64 t15
mid t11 t70 t71 t59 t74 t20 t40 t32
mid t41 t40 t77 t40 t49 t39 t9 t31 t60 t79
long t58 t51 t34 t18 t68 t73 t13 t38 t53 t56 t20 t58 t28 t28
long t2 t12 t50 t57 t28 t12 t0 t1 t68 t57 t52 t41
mid t71 t58 t67 t37 t43 t35 t1 t56
mid t72 t53 t79 t51 t42 t4 t62 t77
long t49 t72 t62 t29 t23 t51 t26 t7 t15 t57 t39 t41 t23 t72 t60
long t9 t51 t20 t3 t30 t1 t77 t11 t0 t56 t23 t41
long t78 t41 t63 t59 t73 t51 t31 t44 t29 t12 t69
mid t27 t56 t12 t57 t22 t54 t52
short t32 t68 t17 t41
mid t25 t70 t23 t7 t24 t9 t14
short t2 t30 t11 t71 t48 t41
short t15 t64 t42 t54
long t39 t56 t35 t22 t55 t72 t14 t19 t78 t68 t27 t7 t5 t63 t73
mid t52 t67 t42 t10 t3 t79 t70
short t64 t72 t61 t61 t52 t39
long t13 t73 t9 t25 t49 t3 t8 t1 t54 t18 t32
short t47 t64 t30 t2 t48 t23
long t18 t33 t59 t41 t17 t35 t45 t36 t35 t48 t48 t71 t73
mid t61 t79 t30 t65 t55 t27 t1 t52 t12 t42
long t44 t14 t14 t66 t76 t21 t66 t71 t39 t36 t4 t63
long t27 t46 t5 t58 t3 t27 t49 t17 t7 t16 t17 t29 t27 t5
mid t2 t2 t50 t76 t61 t41 t21 t58 t52 t24
mid t44 t76 t44 t9 t65 t3 t76 t17 t31 t36
short t71 t16 t29 t10
long t18 t27 t44 t77 t41 t25 t71 t34 t47 t24 t5 t45 t25 t16
short t63 t48 t25 t3 t78
long t57 t67 t15 t63 t54 t27 t59 t66 t59 t78 t16 t43 t44 t32 t67
long t37 t18 t76 t7 t20 t17 t20 t15 t70 t15 t13 t9 t77 t65 t17
long t57 t8 t69 t20 t16 t41 t37 t45 t41 t18 t36 t46 t63 t48
mid t53 t33 t30 t71 t46 t71 t57 t50 t68
long t13 t18 t51 t55 t76 t2 t34 t27 t18 t17 t39
long t31 t51 t46 t1 t30 t73 t47 t43 t69 t51 t50 t27 t74
long t2 t47 t3 t38 t57 t47 t13 t33 t29 t77 t15 t11 t50 t70 t75
mid t77 t71 t45 t55 t6 t46 t42 t46 t72
long t66 t58 t38 t52 t78 t36 t60 t59 t4 t65 t64 t65 t14
mid t65 t18 t34 t7 t58 t15 t30 t61 t34
long t9 t10 t56 t26 t18 t48 t39 t47 t29 t66 t30 t59 t30
long t52 t78 t18 t53 t4 t54 t60 t35 t28 t19 t50 t50 t47
mid t64 t39 t16 t25 t12 t7 t75 t57 t36
short t5 t71 t15 t51 t67 t73
long t53 t4 t79 t22 t28 t50 t62 t6 t9 t53 t42
mid t26 t64 t15 t64 t13 t42 t67
long t9 t19 t56 t7 t9 t78 t42 t18 t51 t62 t49 t25 t69 t22
short t60 t10 t29 t5 t43
mid t6 t39 t65 t55 t59 t1 t75 t63 t13 t52
mid t42 t55 t13 t75 t40 t34 t55 t31 t45 t37
mid t61 t56 t51 t62 t72 t18 t55 t29 t15
long t57 t77 t21 t30 t60 t15 t31 t29 t75 t42 t26 t14
mid t56 t42 t28 t57 t41 t22 t44
long t67 t71 t76 t16 t78 t64 t49 t34 t15 t54 t37 t26 t73
long t32 t57 t41 t70 t54 t28 t48 t13 t26 t6 t75 t53 t7 t48
short t37 t45 t20 t69 t70 t31
long t61 t34 t1 t70 t22 t32 t21 t50 t18 t28 t74
short t30 t0 t31 t7
long t70 t28 t37 t7 t59 t0 t58 t60 t2 t12 t50
short t79 t49 t48 t58 t63
short t50 t47 t50 t43 t47
short t51 t41 t77 t69
short t51 t56 t27
long t73 t44 t11 t36 t42 t1 t32 t72 t57 t42 t39 t44 t54 t0
mid t35 t8 t47 t15 t58 t26 t9 t67 t53 t25
long t76 t9 t56 t69 t2 t64 t35 t20 t34 t0 t36 t20 t73 t41
long t62 t36 t72 t33 t46 t5 t17 t10 t77 t28 t11
mid t22 t24 t41 t12 t1 t68 t66 t17
short t33 t71 t61 t57 t51
mid t26 t30 t55 t68 t56 t34 t0
short t64 t20 t40 t3 t11
short t51 t32 t33 t30
long t4 t73 t42 t21 t79 t39 t63 t22 t2 t69 t78 t1
mid t33 t20 t40 t16 t4 t43 t60
long t30 t71 t10 t51 t62 t43 t29 t55 t19 t53 t79 t41 t59 t78 t50
long t40 t58 t79 t18 t40 t38 t72 t50 t28 t46 t15 t41 t49
long t32 t10 t47 t41 t34 t45 t76 t46 t28 t37 t13 t11 t36
short t66 t4 t43 t66 t53
short t74 t5 t46 t66 t65
mid t69 t20 t78 t14 t46 t73 t50 t26 t50 t62
long t21 t70 t54 t1 t34 t47 t73 t18 t17 t78 t50 t58 t3
long t3 t67 t6 t49 t64 t48 t1 t44 t47 t53 t33
long t21 t56 t22 t40 t37 t43 t11 t53 t24 t15 t0 t3
short t57 t12 t39 t73
short t2 t73 t32 t79 t19 t28
mid t75 t30 t69 t47 t60 t51 t20 t40
short t18 t55 t0 t32
long t30 t73 t69 t33 t0 t40 t5 t17 t61 t69 t13 t2 t66 t59
long t35 t7 t56 t59 t71 t2 t73 t14 t12 t20 t32 t51 t5 t75
short t9 t63 t51 t76 t72 t77
short t53 t65 t54 t16 t52
long t63 t25 t39 t22 t1 t48 t24 t66 t64 t9 t44 t49 t58
mid t45 t25 t71 t7 t5 t64 t34 t57 t15 t62
long t25 t24 t50 t5 t0 t0 t44 t75 t44 t13 t47 t39 t18
long t47 t3 t21 t37 t48 t48 t36 t44 t31 t65 t18 t79
long t76 t46 t46 t41 t43 t34 t41 t7 t30 t5 t67 t0
short t79 t10 t7 t19
short t52 t26 t20 t35
short t59 t28 t24 t64 t16
long t54 t7 t38 t72 t74 t45 t21 t38 t34 t16 t47
long t40 t0 t23 t19 t73 t12 t39 t29 t44 t28 t43 t76
mid t49 t50 t58 t66 t54 t67 t73 t54 t68 t64
short t35 t2 t65 t11
long t2 t25 t36 t71 t44 t74 t77 t26 t7 t41 t13 t38 t59 t27
mid t35 t17 t4 t46 t45 t58 t69 t34 t0
long t17 t18 t47 t34 t23 t78 t5 t71 t13 t58 t79 t51 t38 t8
mid t74 t74 t20 t6 t77 t36 t18 t77
mid t9 t34 t60 t52 t53 t42 t79 t42
mid t43 t77 t35 t65 t76 t28 t29 t49 t76
mid t25 t67 t52 t74 t30 t23 t69 t74 t21 t63
short t11 t8 t1 t23 t42
mid t2 t32 t78 t35 t78 t40 t12
long t79 t54 t42 t4 t60 t43 t66 t72 t48 t20 t52 t65 t41
mid t74 t73 t41 t70 t74 t1 t1 t24
mid t43 t55 t51 t78 t8 t67 t28 t69
short t22 t73 t45 t16 t40
long t1 t10 t78 t50 t24 t14 t34 t37 t10 t39 t21 t67 t47 t34 t3
mid t15 t77 t53 t74 t12 t47 t65 t60
short t19 t52 t10 t54
mid t62 t43 t75 t74 t18 t47 t61
short t79 t37 t13 t30 t4
long t10 t53 t26 t66 t65 t50 t17 t74 t39 t55 t57 t32
long t49 t75 t1 t74 t26 t38 t39 t74 t9 t53 t34 t40 t11 t34
long t18 t28 t60 t70 t5 t28 t36 t68 t2 t73 t2 t78 t4 t32
short t77 t72 t39 t34 t4 t50
long t46 t44 t74 t29 t21 t75 t16 t68 t59 t12 t60 t23 t60 t43
mid t55 t11 t59 t30 t19 t55 t55 t32 t10 t46
long t68 t67 t51 t52 t57 t73 t26 t71 t53 t43 t58 t24 t71 t22
long t68 t29 t56 t69 t55 t25 t73 t60 t42 t9 t73 t35 t48
short t65 t72 t64 t31 t16 t43
long t79 t61 t48 t8 t16 t57 t33 t0 t53 t68 t9
mid t15 t8 t3 t41 t42 t68 t67
long t52 t0 t40 t61 t31 t27 t62 t28 t59 t52 t23 t18
short t22 t36 t72
mid t4 t24 t7 t44 t43 t7 t77 t61 t1
short t22 t44 t5 t76 t26 t35
long t70 t71 t22 t75 t29 t5 t70 t74 t48 t7 t38 t34 t4 t7 t42
long t39 t12 t42 t5 t76 t43 t26 t68 t49 t34 t17 t47 t77 t79 t41
short t38 t47 t29 t22 t7 t43
long t1 t71 t48 t53 t50 t6 t7 t44 t19 t53 t75 t55 t36
short t45 t58 t39 t17 t17 t70
mid t28 t22 t52 t79 t74 t57 t28 t1 t18
long t8 t44 t74 t53 t56 t28 t25 t38 t25 t62 t78 t21
mid t31 t37 t39 t18 t74 t31 t70
long t27 t26 t56 t13 t60 t65 t73 t3 t18 t67 t21 t14
mid t28 t21 t8 t18 t8 t69 t54 t60 t75
short t14 t60 t76 t41 t6
long t50 t16 t8 t7 t68 t34 t75 t45 t18 t2 t34 t42
short t53 t57 t74 t7 t30 t20
short t21 t66 t52 t8
mid t25 t47 t11 t48 t17 t65 t19 t32 t77
short t62 t56 t15 t37 t78
short t10 t25 t71 t0
long t22 t1 t33 t57 t54 t59 t4 t13 t26 t6 t5 t63 t24 t27
mid t7 t48 t34 t70 t52 t4 t68 t2
long t49 t53 t42 t20 t39 t29 t71 t19 t15 t52 t61 t40 t11
long t70 t46 t42 t59 t42 t58 t74 t19 t3 t22 t67 t27 t17 t45 t50
mid t0 t34 t51 t28 t47 t39 t58 t79 t71
mid t62 t31 t14 t9 t74 t41 t28 t46 t72
mid t61 t59 t13 t22 t54 t20 t8 t51 t57 t6
mid t13 t72 t55 t4 t69 t7 t42 t21 t26 t18
mid t70 t77 t11 t13 t2 t67 t2
mid t5 t4 t59 t24 t30 t32 t58 t37
short t42 t69 t22 t32 t21
long t57 t67 t54 t64 t56 t46 t74 t45 t73 t47 t23 t54
long t70 t77 t6 t45 t62 t76 t67 t12 t19 t22 t29 t64
long t32 t48 t75 t43 t50 t40 t19 t0 t20 t72 t75
mid t16 t68 t69 t53 t27 t67 t25
long t66 t49 t3 t8 t15 t34 t3 t31 t63 t15 t41 t23 t31 t40 t25
short t69 t51 t67 t6 t33
long t4 t44 t77 t61 t59 t57 t26 t44 t46 t68 t44
long t26 t32 t12 t70 t37 t70 t0 t74 t33 t32 t23 t1 t26 t42
mid t56 t70 t44 t13 t61 t30 t48 t76 t43 t24
long t37 t58 t24 t22 t40 t68 t73 t30 t15 t73 t17 t21 t5
long t66 t56 t56 t34 t67 t73 t46 t40 t32 t79 t72 t19
short t37 t38 t47 t62 t1
short t23 t0 t0
short t77 t64 t19 t49
short t19 t78 t0 t40 t51 t16
long t14 t62 t36 t25 t69 t35 t47 t71 t33 t46 t29 t78
mid t19 t22 t44 t8 t60 t67 t32 t49 t79 t16
short t43 t2 t17 t40 t3
short t79 t22 t38
mid t40 t38 t4 t60 t10 t63 t51 t41 t23 t1
mid t63 t23 t66 t51 t22 t18 t42 t51
long t41 t25 t47 t16 t35 t35 t69 t72 t8 t23 t5 t75 t46 t54
mid t40 t69 t79 t56 t49 t19 t57 t47
mid t48 t22 t33 t78 t75 t13 t5
long t64 t39 t21 t32 t44 t37 t33 t65 t54 t9 t75 t6
mid t59 t44 t56 t72 t48 t39 t6 t10 t47
long t66 t38 t1 t56 t45 t17 t69 t56 t26 t24 t65 t20 t25
long t72 t21 t12 t12 t55 t18 t21 t16 t64 t65 t49 t53
short t66 t41 t7
long t74 t32 t65 t49 t25 t41 t57 t56 t57 t56 t37 t36 t27
long t43 t27 t46 t33 t40 t62 t24 t8 t72 t25 t46 t35 t65
short t34 t78 t52 t15
long t10 t8 t33 t55 t56 t70 t17 t0 t20 t77 t67 t8 t0 t76
short t7 t20 t74 t46 t25 t34
short t71 t49 t1 t75
long t62 t28 t62 t24 t17 t4 t8 t73 t20 t64 t37 t29 t78 t56
long t43 t32 t45 t54 t77 t69 t5 t64 t47 t72 t78 t78 t54 t45 t76
mid t21 t10 t29 t69 t24 t51 t2 t15
short t10 t27 t65
mid t78 t50 t1 t75 t16 t62 t65
mid t69 t23 t77 t54 t0 t18 t77
mid t2 t67 t41 t34 t41 t3 t58 t15
long t45 t21 t27 t73 t36 t61 t15 t11 t27 t60 t65 t41 t60 t73
short t38 t37 t23 t15
long t8 t79 t35 t12 t17 t65 t4 t77 t0 t70 t2 t41
long t70 t60 t14 t38 t28 t66 t3 t58 t48 t57 t79 t2 t35
mid t51 t14 t74 t30 t9 t31 t21 t22
mid t8 t7 t37 t50 t49 t68 t16 t48 t68 t28
long t60 t79 t61 t62 t16 t44 t38 t79 t40 t21 t43 t38 t73 t58
long t49 t49 t8 t69 t0 t49 t23 t9 t65 t8 t50 t23
mid t18 t26 t61 t63 t50 t31 t60 t32 t14 t51
long t38 t64 t9 t32 t55 t38 t72 t15 t3 t59 t76
short t57 t71 t12 t15
long t8 t1 t30 t37 t2 t32 t17 t40 t48 t54 t67 t35 t54 t21
mid t63 t77 t9 t5 t30 t5 t37
long t44 t30 t53 t39 t45 t34 t2 t50 t45 t63 t18 t57
long t39 t18 t6 t68 t71 t4 t34 t74 t28 t1 t7 t61 t56 t67 t50
short t79 t33 t25
long t18 t44 t74 t16 t55 t31 t73 t52 t9 t50 t31 t44 t49 t67 t4
short t10 t61 t44 t59
long t57 t40 t60 t74 t67 t40 t27 t48 t32 t76 t48 t21
long t50 t75 t35 t79 t2 t59 t6 t56 t74 t50 t31 t3
long t73 t29 t4 t40 t15 t3 t72 t26 t22 t40 t6 t36
long t13 t51 t48 t42 t37 t55 t65 t29 t66 t45 t2 t49 t50
long t42 t15 t76 t39 t15 t18 t34 t21 t30 t67 t28 t21
short t72 t57 t75 t47 t35
mid t55 t56 t39 t69 t7 t29 t76 t17 t64
short t38 t77 t55 t33 t66
mid t39 t4 t52 t59 t54 t15 t19
short t56 t67 t48 t38 t35
short t29 t19 t50 t62
short t72 t50 t41 t17 t51 t44
long t14 t20 t19 t20 t59 t39 t12 t60 t58 t7 t52 t75 t6 t9
mid t77 t73 t3 t72 t48 t13 t65 t16
long t57 t45 t73 t75 t58 t65 t24 t69 t4 t17 t44 t35
mid t53 t53 t6 t0 t16 t26 t70 t24 t2
mid t26 t57 t45 t72 t72 t71 t11 t43
mid t73 t66 t35 t29 t65 t6 t37
mid t10 t23 t41 t60 t0 t16 t35 t41 t19
long t74 t70 t49 t27 t37 t6 t26 t11 t6 t29 t76 t74 t76 t20 t79
long t28 t17 t68 t46 t55 t55 t9 t28 t38 t10 t54
mid t68 t24 t77 t36 t0 t78 t36 t49 t21
short t75 t78 t4 t4 t10 t65
long t61 t12 t67 t63 t77 t19 t37 t41 t20 t20 t58 t79 t54 t75 t15
mid t0 t62 t45 t18 t10 t63 t60 t48
long t6 t21 t76 t48 t69 t22 t7 t14 t66 t52 t38 t36 t47 t2 t44
short t2 t36 t8 t35 t25
long t26 t29 t78 t63 t22 t55 t5 t77 t37 t46 t49 t36 t8
mid t4 t52 t1 t60 t45 t59 t79 t74
long t57 t31 t24 t14 t8 t31 t7 t46 t42 t43 t51 t2
mid t54 t57 t28 t19 t24 t62 t29 t77
mid t69 t71 t78 t16 t45 t61 t76 t55 t27
long t69 t9 t4 t37 t74 t50 t30 t53 t32 t2 t70 t3 t78 t65 t21
short t37 t27 t3 t76 t60 t41
mid t24 t37 t61 t63 t57 t46 t50
mid t76 t5 t76 t7 t42 t34 t0 t23 t32 t32
mid t63 t50 t46 t4 t79 t39 t45 t62 t36 t77
long t44 t50 t76 t17 t35 t51 t62 t77 t36 t77 t26 t66 t76 t20
short t68 t21 t4 t24 t68
mid t31 t30 t63 t73 t61 t38 t57 t56
short t69 t9 t46
short t73 t39 t52 t27 t25
long t55 t4 t27 t48 t11 t1 t8 t36 t32 t78 t47
long t7 t57 t44 t67 t23 t70 t43 t66 t1 t9 t63 t43 t0
mid t34 t65 t4 t19 t62 t39 t26 t5
long t54 t37 t56 t74 t7 t41 t30 t64 t23 t19 t7 t1 t34 t71
long t73 t2 t33 t65 t49 t29 t49 t60 t7 t60 t67 t37
short t13 t51 t16 t33
long t77 t36 t43 t36 t47 t16 t65 t50 t60 t36 t53 t41 t48 t42 t62
long t19 t39 t46 t26 t0 t27 t29 t18 t6 t65 t63 t53
mid t34 t73 t42 t35 t78 t53 t27
long t30 t32 t59 t28 t7 t61 t44 t4 t46 t49 t54
short t38 t37 t20 t48
mid t6 t73 t71 t8 t27 t4 t19
long t43 t74 t37 t28 t55 t53 t40 t40 t21 t9 t71 t22 t9
short t6 t18 t24
long t52 t49 t42 t53 t28 t74 t6 t56 t54 t3 t31 t45 t21 t34
short t37 t22 t52 t34 t48
mid t42 t47 t73 t5 t42 t36 t53 t36 t76
mid t73 t12 t45 t42 t25 t63 t27 t7
short t1 t71 t5 t39 t20
mid t60 t38 t53 t15 t13 t12 t2 t1
short t70 t55 t18 t28 t2 t1
long t49 t59 t65 t66 t34 t32 t68 t65 t46 t49 t63
mid t41 t57 t42 t76 t79 t20 t13
long t33 t39 t45 t47 t44 t25 t47 t10 t16 t73 t6
long t46 t18 t52 t7 t77 t71 t57 t66 t71 t43 t32 t9
short t41 t7 t42 t7
short t75 t11 t62 t45 t39
short t53 t21 t5
long t76 t48 t13 t71 t59 t11 t48 t76 t26 t4 t74
short t46 t12 t79 t28 t70
short t59 t2 t75 t31 t51
long t52 t48 t13 t50 t56 t13 t2 t48 t15 t25 t62
mid t67 t68 t76 t46 t23 t57 t41 t60
long t9 t42 t50 t31 t44 t5 t24 t9 t6 t48 t16 t7
long t30 t22 t40 t15 t32 t35 t24 t70 t23 t64 t74
long t61 t8 t79 t16 t78 t5 t39 t75 t44 t74 t13 t13 t13 t36 t53
long t44 t45 t22 t6 t37 t56 t20 t14 t26 t34 t62 t46
short t65 t43 t70 t5
long t5 t11 t47 t5 t38 t38 t3 t34 t71 t47 t8 t30 t46 t49
mid t46 t56 t14 t29 t2 t39 t48 t32 t1 t14
short t56 t28 t23
mid t49 t65 t28 t3 t14 t69 t12 t33 t49
mid t11 t69 t36 t15 t70 t78 t17 t39 t78
short t63 t48 t30 t74
short t68 t78 t17 t54 t32
short t50 t10 t13 t12 t21 t75
long t9 t25 t66 t16 t63 t71 t71 t28 t1 t34 t7
long t9 t30 t61 t75 t11 t75 t38 t60 t12 t19 t34 t31
long t18 t39 t64 t70 t79 t70 t35 t24 t78 t39 t64 t2
mid t64 t23 t7 t6 t16 t32 t46 t56
mid t57 t30 t47 t4 t31 t73 t74
mid t68 t56 t47 t74 t23 t75 t59 t62 t42
short t54 t29 t55 t10 t76
long t34 t26 t2 t70 t39 t28 t59 t51 t68 t59 t5 t58
short t33 t73 t78 t36 t35
mid t76 t78 t26 t7 t45 t2 t30 t40
short t8 t10 t62 t60
short t40 t44 t57 t40 t74 t45
mid t22 t8 t8 t51 t0 t25 t66
short t79 t16 t79
short t71 t30 t45 t73
mid t6 t2 t39 t33 t29 t37 t49 t4 t50
long t47 t60 t72 t73 t28 t35 t8 t31 t33 t14 t19 t8 t6
short t54 t68 t49 t56 t56 t21
short t44 t31 t63 t33
mid t49 t6 t64 t73 t47 t34 t52 t31 t55 t18
mid t29 t57 t20 t8 t53 t32 t17 t31 t50
long t43 t14 t79 t43 t31 t53 t21 t56 t21 t78 t29 t53 t48 t54 t23
long t73 t34 t11 t78 t11 t37 t77 t49 t4 t44 t27 t3 t59
long t21 t79 t45 t5 t10 t2 t19 t74 t79 t62 t66 t66
long t56 t8 t65 t65 t11 t14 t59 t33 t6 t12 t61
short t57 t12 t46 t14 t65 t20
mid t27 t32 t40 t71 t19 t79 t29 t69 t17 t43
short t59 t43 t45
mid t39 t49 t11 t21 t51 t53 t79 t68 t34 t33
mid t32 t28 t56 t31 t28 t17 t37 t18
mid t47 t58 t78 t53 t51 t3 t41
mid t37 t18 t73 t44 t39 t25 t41 t35
short t10 t29 t47 t5 t11
mid t21 t5 t53 t7 t32 t60 t60
long t48 t70 t74 t7 t14 t75 t45 t14 t4 t12 t11
long t61 t27 t22 t61 t15 t18 t13 t14 t29 t20 t71 t77
mid t4 t58 t26 t9 t78 t44 t66 t79
short t75 t18 t5 t45 t14
long t23 t58 t46 t3 t59 t75 t34 t13 t69 t77 t18 t41 t39
long t74 t42 t53 t11 t34 t3 t68 t13 t62 t57 t59 t40 t76
long t21 t39 t59 t44 t77 t1 t19 t47 t41 t75 t10 t14 t40
long t15 t50 t20 t18 t59 t40 t69 t74 t32 t37 t38 t6
long t68 t2 t1 t57 t45 t1 t6 t44 t50 t12 t50 t65
long t0 t32 t54 t31 t10 t52 t26 t48 t4 t9 t7
long t1 t61 t12 t3 t24 t18 t58 t10 t25 t20 t71 t41
long t34 t24 t66 t46 t44 t46 t41 t46 t55 t3 t55 t39 t75 t79 t71
long t42 t78 t41 t75 t54 t19 t69 t8 t22 t43 t79
long t64 t24 t65 t10 t38 t4 t16 t50 t52 t59 t53 t77 t36
long t44 t71 t13 t52 t56 t49 t51 t71 t25 t15 t15 t60 t73 t40
short t74 t55 t60 t66 t50
mid t17 t48 t6 t49 t37 t77 t25 t1
mid t16 t3 t19 t45 t59 t21 t41 t53
short t59 t73 t74 t25 t43
short t42 t32 t16 t57
short t2 t69 t45 t46 t13 t19
long t27 t45 t31 t53 t51 t68 t16 t31 t10 t50 t65 t19 t52
mid t26 t31 t28 t27 t69 t27 t40
short t72 t1 t76 t9
short t24 t51 t73 t77 t9 t18
mid t60 t54 t11 t8 t5 t69 t77 t7
long t13 t17 t39 t2 t4 t29 t45 t48 t44 t58 t8 t12 t51 t47 t13
long t24 t46 t63 t18 t63 t63 t26 t30 t65 t66 t24 t47 t16
long t41 t1 t61 t15 t79 t3 t26 t34 t63 t26 t34 t39
short t24 t63 t27 t2
long t58 t12 t49 t51 t40 t37 t68 t41 t36 t47 t26 t28 t35 t17
mid t29 t67 t20 t38 t44 t30 t60 t73 t6
mid t6 t75 t46 t38 t75 t64 t68
mid t26 t43 t14 t52 t73 t34 t57 t62 t10 t60
mid t16 t29 t62 t27 t6 t55 t45 t74
long t45 t69 t55 t34 t72 t1 t67 t63 t0 t1 t74
short t50 t33 t76 t48 t62
long t62 t23 t36 t15 t15 t69 t50 t42 t59 t7 t7 t11
short t9 t61 t39
long t36 t70 t64 t39 t51 t37 t77 t71 t63 t78 t66 t69 t58 t2
long t9 t65 t73 t53 t41 t38 t9 t26 t6 t17 t13 t52 t32 t17
short t47 t77 t51 t58 t11 t56
short t9 t22 t43 t12 t24
long t57 t65 t10 t5 t31 t75 t63 t74 t20 t35 t0
long t15 t13 t73 t1 t30 t12 t11 t46 t40 t6 t6 t46
mid t45 t58 t54 t77 t19 t33 t12
long t72 t37 t29 t56 t29 t6 t26 t40 t22 t17 t45
long t38 t11 t1 t11 t26 t46 t55 t34 t40 t36 t55 t77
long t2 t6 t63 t62 t1 t61 t15 t26 t75 t50 t30
mid t3 t1 t0 t72 t79 t42 t18 t18 t71 t45
long t26 t4 t49 t31 t43 t72 t65 t23 t70 t43 t69 t22 t69
mid t39 t3 t74 t24 t78 t78 t20 t71
long t1 t79 t50 t54 t12 t34 t51 t2 t53 t48 t58
mid t48 t46 t65 t79 t40 t1 t10 t62
long t13 t32 t68 t5 t22 t33 t56 t53 t66 t0 t46 t55 t21 t2 t74
short t40 t0 t10 t4
mid t18 t45 t40 t45 t17 t62 t8 t64 t52 t48
long t4 t39 t58 t74 t34 t31 t75 t30 t3 t50 t39
mid t37 t73 t41 t48 t3 t20 t19
long t7 t4 t23 t11 t15 t26 t12 t48 t79 t56 t13 t37
long t56 t61 t47 t34 t78 t69 t61 t78 t24 t17 t33 t34 t24 t38 t21
long t46 t4 t56 t29 t29 t14 t59 t64 t56 t31 t19 t12
short t32 t35 t70 t20
mid t68 t5 t53 t20 t57 t11 t56 t76 t53
short t46 t31 t21 t7
mid t74 t25 t74 t13 t23 t77 t43 t27 t75 t50
long t1 t38 t55 t14 t54 t39 t61 t23 t66 t15 t19
short t4 t10 t14 t77 t79 t60
short t11 t2 t65 t48 t40 t58
long t10 t11 t77 t28 t50 t53 t1 t2 t21 t23 t63 t55 t64 t6
short t67 t21 t4 t1 t15 t54
long t1 t8 t38 t43 t71 t1 t49 t35 t69 t26 t37 t56 t51 t62 t4
short t15 t19 t45 t57 t35 t79
long t52 t16 t53 t41 t21 t49 t63 t60 t30 t6 t15 t45 t72 t4 t49
short t57 t45 t4
short t36 t48 t12 t60 t68
short t51 t9 t26 t8
short t19 t8 t72 t71 t12 t15
long t37 t7 t44 t9 t49 t29 t63 t39 t10 t41 t23 t71 t17 t40
long t63 t55 t51 t66 t0 t41 t51 t43 t56 t18 t56 t29 t27 t2 t38
mid t43 t7 t4 t8 t19 t70 t46 t36 t62
short t28 t47 t34 t69
long t62 t12 t5 t52 t21 t9 t39 t37 t14 t35 t26 t79 t4 t9
mid t78 t38 t66 t46 t16 t18 t42 t62 t48
mid t62 t70 t63 t57 t72 t32 t11 t48 t54 t5
long t22 t75 t70 t14 t15 t63 t38 t38 t65 t1 t4 t18 t27
mid t13 t54 t70 t45 t62 t18 t10 t9
long t21 t7 t9 t21 t12 t76 t75 t54 t74 t41 t0 t78
long t23 t58 t29 t63 t20 t67 t3 t28 t11 t51 t55 t54 t64
short t48 t67 t60
long t20 t70 t71 t20 t41 t73 t3 t50 t9 t63 t39 t26 t37
long t32 t66 t19 t7 t23 t38 t66 t34 t59 t27 t55 t12 t46 t12 t3
short t52 t50 t16
short t8 t77 t73 t22 t28 t5
mid t58 t46 t26 t50 t44 t32 t7
short t49 t3 t35
long t65 t73 t13 t16 t21 t43 t22 t14 t63 t65 t64 t4 t55 t15
long t71 t43 t7 t60 t64 t34 t52 t3 t73 t10 t48 t58 t14 t20
mid t3 t71 t62 t0 t49 t55 t62 t3 t44
short t36 t71 t35 t31 t11
short t22 t8 t8 t69 t26
mid t70 t11 t77 t47 t71 t0 t8 t49
short t78 t4 t58 t25 t16 t49
mid t73 t1 t11 t28 t10 t33 t43 t35
mid t77 t65 t31 t47 t32 t27 t7
long t72 t35 t15 t69 t12 t38 t3 t4 t31 t9 t45
long t50 t26 t22 t25 t62 t23 t16 t34 t78 t16 t44 t0 t57 t36 t60
long t5 t51 t4 t34 t65 t16 t71 t21 t46 t70 t57 t61 t6 t54 t17
long t61 t30 t29 t8 t19 t20 t45 t49 t31 t3 t55 t66 t6
short t79 t75 t33 t54 t43 t42
long t16 t6 t35 t24 t24 t3 t51 t0 t34 t22 t28 t64
long t42 t3 t28 t44 t18 t22 t42 t22 t76 t37 t47 t54
short t36 t31 t39 t8
mid t30 t12 t59 t72 t56 t1 t72 t50 t15 t57
mid t47 t24 t75 t57 t32 t77 t33
long t11 t9 t43 t34 t66 t78 t28 t34 t71 t32 t46
short t38 t65 t11 t30
short t21 t16 t22 t65
short t13 t71 t27
mid t57 t54 t43 t75 t70 t0 t28
long t30 t67 t32 t11 t24 t69 t72 t37 t63 t70 t29 t12
long t72 t63 t56 t71 t10 t16 t52 t76 t57 t36 t64 t67 t3 t65
long t62 t71 t56 t69 t68 t78 t38 t33 t76 t58 t61 t77 t0 t28 t57
short t53 t37 t73 t28 t64 t8
mid t64 t76 t17 t65 t38 t26 t4 t2 t57 t14
long t15 t51 t50 t25 t71 t58 t34 t79 t7 t71 t57 t30 t34
short t54 t4 t27 t64
long t56 t12 t51 t77 t77 t16 t19 t59 t54 t41 t70 t34 t74 t42
mid t4 t63 t0 t22 t19 t51 t15 t19 t30
mid t55 t57 t36 t1 t40 t45 t44 t70 t10
long t74 t52 t21 t10 t52 t30 t38 t51 t73 t6 t10
long t39 t14 t29 t75 t28 t76 t0 t10 t32 t63 t65 t66
short t27 t46 t42 t19 t15 t10
long t38 t8 t27 t5 t77 t67 t65 t70 t53 t23 t8 t31 t23
long t37 t16 t59 t75 t68 t50 t8 t63 t77 t78 t61 t73 t58 t18
short t61 t64 t18 t40
short t15 t17 t54 t31 t43 t50
short t4 t16 t13
long t43 t3 t58 t17 t24 t27 t55 t14 t59 t24 t36
long t29 t53 t40 t68 t73 t20 t28 t62 t3 t44 t0 t64 t71 t21
mid t54 t29 t53 t1 t37 t34 t39 t15 t62 t43
long t34 t41 t63 t54 t59 t46 t69 t39 t4 t12 t25 t9 t76 t3
mid t12 t72 t1 t76 t68 t62 t14 t11 t29 t60
mid t15 t56 t50 t33 t48 t24 t68 t29 t72
short t8 t32 t42 t58 t14 t12
long t36 t63 t18 t2 t61 t28 t71 t42 t13 t61 t16 t7 t68 t79
short t78 t6 t50 t2 t75 t23
long t33 t42 t2 t50 t21 t41 t45 t20 t52 t32 t16 t73
long t42 t7 t0 t58 t9 t12 t38 t77 t42 t28 t8 t48
long t37 t22 t55 t39 t18 t40 t66 t73 t50 t61 t71 t39
short t74 t5 t19 t50
long t26 t54 t12 t67 t31 t49 t39 t9 t44 t71 t65
short t23 t60 t55 t3
short t17 t7 t65 t28 t36 t51
long t67 t65 t29 t44 t73 t42 t25 t33 t79 t78 t64 t38
short t79 t52 t61 t54 t39
mid t8 t76 t32 t67 t7 t23 t59
short t30 t20 t5 t46 t22
short t76 t71 t12
long t40 t58 t67 t7 t79 t3 t61 t4 t28 t40 t21 t2 t1 t23 t71
short t23 t25 t60 t16 t54
long t11 t17 t31 t30 t1 t42 t14 t15 t33 t16 t53 t37
long t16 t40 t55 t7 t78 t65 t33 t72 t15 t59 t62 t79 t56 t29 t2
long t60 t58 t29 t19 t29 t13 t79 t46 t61 t27 t78 t61
long t5 t57 t28 t35 t24 t17 t5 t12 t28 t69 t24 t54 t71 t6 t53
mid t33 t78 t61 t24 t18 t6 t9 t63 t48
long t50 t75 t53 t56 t59 t69 t32 t0 t17 t44 t31
mid t49 t14 t30 t68 t53 t54 t54 t7 t46
short t34 t11 t66
long t15 t46 t23 t76 t16 t69 t25 t64 t30 t40 t40 t71
short t18 t21 t7
long t7 t30 t27 t14 t56 t31 t8 t67 t21 t20 t32
mid t38 t45 t54 t59 t60 t2 t21
long t54 t67 t76 t9 t59 t61 t54 t34 t41 t57 t33
mid t36 t37 t33 t31 t30 t30 t49 t70
long t77 t20 t27 t38 t52 t28 t40 t65 t70 t63 t33 t21
mid t71 t60 t68 t61 t45 t24 t32 t4
long t40 t9 t17 t37 t48 t11 t32 t56 t21 t13 t76 t33 t68 t22 t54
long t12 t77 t0 t8 t54 t57 t32 t39 t31 t54 t70 t10
long t25 t39 t62 t51 t28 t55 t19 t4 t71 t4 t1 t61 t58
short t13 t14 t31 t12 t7 t53
long t17 t7 t24 t58 t20 t16 t51 t20 t14 t48 t30
long t30 t52 t47 t43 t60 t53 t46 t46 t15 t18 t10 t78
long t75 t49 t78 t5 t39 t26 t64 t66 t53 t47 t9 t68 t57 t26 t63
long t38 t30 t40 t10 t32 t20 t45 t11 t0 t19 t18 t21
long t9 t57 t17 t27 t47 t11 t59 t10 t44 t28 t46 t40 t69 t7
mid t78 t6 t30 t2 t44 t66 t45 t74
long t22 t0 t14 t52 t61 t66 t44 t69 t48 t62 t56
long t51 t60 t42 t62 t40 t34 t56 t78 t35 t13 t44 t37
long t39 t45 t34 t37 t37 t39 t15 t31 t18 t48 t14 t57 t20 t47 t72
mid t53 t65 t58 t69 t45 t50 t29
mid t1 t78 t22 t14 t16 t54 t49 t72 t6
short t19 t27 t46 t72 t12 t37
mid t49 t46 t49 t43 t78 t14 t42
mid t50 t61 t10 t46 t10 t0 t76 t34
long t16 t61 t39 t74 t28 t26 t3 t57 t70 t17 t19 t72 t7 t59
long t58 t47 t56 t67 t70 t4 t3 t5 t59 t10 t22 t0 t52 t31 t53
short t72 t79 t15 t69
long t54 t22 t68 t13 t8 t69 t3 t58 t61 t42 t57 t52
mid t61 t57 t53 t4 t14 t20 t38 t13
mid t24 t11 t57 t71 t33 t78 t27 t68 t24
long t26 t67 t46 t51 t58 t17 t29 t49 t8 t25 t31
mid t77 t15 t73 t47 t11 t52 t35
mid t38 t71 t33 t21 t67 t26 t51
mid t75 t64 t77 t44 t34 t9 t5
long t33 t38 t48 t71 t38 t50 t55 t20 t64 t52 t22 t50
mid t64 t74 t7 t77 t46 t35 t9 t26 t11
mid t76 t52 t54 t67 t48 t0 t10 t75 t3
mid t38 t77 t24 t45 t21 t53 t16 t77 t22 t78
mid t27 t21 t11 t67 t49 t40 t53 t41
mid t63 t46 t72 t65 t36 t31 t27 t41
short t17 t2 t64 t18 t75 t7
short t30 t36 t3
mid t46 t68 t78 t48 t25 t75 t29 t6 t25 t68
short t40 t35 t15 t47 t3 t61
long t7 t74 t57 t39 t4 t78 t31 t16 t71 t70 t63
mid t12 t35 t3 t35 t53 t41 t70
short t56 t66 t41 t64 t24
long t68 t59 t35 t74 t67 t21 t22 t22 t50 t65 t21 t24
mid t3 t64 t16 t31 t60 t1 t25 t49
long t28 t13 t55 t27 t11 t65 t56 t74 t36 t54 t27
short t48 t26 t23 t63
mid t22 t79 t9 t6 t49 t3 t55 t56
mid t45 t65 t59 t49 t72 t51 t30 t31 t65 t37
long t51 t42 t76 t29 t73 t60 t79 t14 t24 t64 t51 t51 t60
short t58 t9 t14
long t21 t5 t10 t42 t61 t45 t58 t66 t6 t27 t46 t17 t46
mid t27 t17 t12 t75 t63 t19 t71 t52 t32 t49
mid t5 t21 t61 t65 t52 t12 t19 t47 t34
short t16 t15 t62 t10
long t49 t23 t40 t30 t5 t77 t8 t40 t40 t12 t78
mid t27 t13 t53 t23 t54 t50 t38
short t1 t3 t29 t22
short t2 t50 t78
mid t60 t76 t67 t17 t69 t1 t69 t18
mid t19 t65 t44 t31 t7 t72 t40 t6
long t51 t36 t48 t27 t73 t2 t15 t26 t34 t59 t25 t21 t41 t22
short t30 t18 t9
long t73 t24 t33 t49 t20 t76 t55 t74 t60 t74 t23 t0
mid t78 t4 t34 t47 t56 t6 t8 t62 t56 t67
short t1 t42 t47 t61 t23 t78
long t14 t28 t58 t77 t45 t22 t21 t42 t51 t34 t12 t19 t33
mid t29 t78 t15 t4 t32 t45 t71 t63 t76
mid t1 t17 t40 t76 t21 t76 t37 t20
long t36 t7 t22 t57 t22 t25 t54 t36 t24 t20 t67 t54
short t67 t17 t31 t62
long t7 t11 t1 t57 t77 t71 t60 t58 t27 t36 t14 t24 t69
mid t74 t48 t36 t1 t11 t25 t49 t28 t3
long t38 t38 t19 t25 t44 t69 t44 t75 t74 t36 t58 t46 t29
long t47 t53 t30 t65 t76 t58 t22 t22 t42 t63 t78 t16 t29 t2
long t41 t18 t55 t36 t33 t76 t18 t47 t23 t24 t53 t74
short t70 t12 t67 t0 t36
mid t69 t40 t77 t30 t39 t27 t27 t24 t31
long t47 t72 t28 t32 t33 t13 t41 t55 t64 t75 t26 t47 t79 t78
long t79 t77 t11 t0 t56 t19 t11 t57 t14 t35 t49 t68 t54 t24
mid t23 t67 t35 t8 t22 t70 t67 t55 t14
long t44 t11 t24 t22 t52 t38 t30 t60 t10 t13 t1 t48 t73
short t66 t53 t12
long t64 t51 t45 t67 t37 t70 t63 t54 t45 t34 t47 t8
mid t39 t42 t62 t1 t65 t62 t59 t15 t71 t58
long t52 t76 t30 t47 t73 t36 t5 t76 t18 t14 t59 t73 t60 t53 t20
long t32 t39 t57 t37 t60 t7 t16 t42 t16 t26 t55 t62 t43 t78 t38
long t19 t66 t23 t60 t77 t64 t75 t21 t11 t61 t64
mid t50 t0 t33 t2 t71 t24 t65 t17
short t30 t23 t48 t72 t31
long t47 t15 t45 t8 t58 t72 t53 t31 t21 t42 t59
long t52 t50 t70 t71 t52 t60 t24 t10 t73 t22 t66 t68 t0
short t30 t47 t75
short t52 t53 t79 t68
short t20 t58 t43 t64 t57 t9
mid t3 t57 t59 t73 t23 t46 t11 t51
short t69 t44 t37 t73 t75 t20
long t0 t55 t76 t54 t27 t5 t45 t32 t62 t5 t38 t79 t12 t40 t68
long t62 t19 t23 t70 t27 t0 t55 t14 t13 t13 t41 t5 t26 t62 t11
short t3 t7 t3 t5 t24 t76
long t9 t57 t14 t48 t39 t46 t58 t53 t70 t19 t16 t76 t4 t19 t5
mid t58 t43 t78 t33 t51 t15 t24 t48 t29 t61
long t20 t6 t74 t40 t19 t36 t14 t10 t18 t51 t41 t42 t13 t76
long t53 t45 t56 t66 t46 t39 t32 t62 t69 t12 t3 t5 t35
long t11 t8 t79 t39 t74 t65 t38 t39 t57 t37 t44 t17 t61 t62 t63
short t10 t21 t32 t4 t59 t79
short t36 t34 t43 t40
short t65 t72 t12 t75
long t31 t14 t13 t21 t24 t0 t7 t37 t21 t9 t42 t44 t13 t24
mid t13 t67 t16 t36 t69 t70 t50 t21
mid t19 t3 t24 t70 t75 t67 t25 t67 t28 t69
long t19 t77 t14 t44 t64 t12 t58 t33 t75 t63 t15 t31
short t27 t16 t7
long t27 t61 t63 t49 t10 t28 t47 t68 t15 t17 t60 t14 t63 t43 t73
short t52 t66 t6
mid t61 t3 t11 t70 t35 t75 t61
long t63 t4 t4 t67 t42 t25 t25 t24 t5 t13 t61
short t4 t23 t70 t47
short t22 t43 t10
long t29 t62 t39 t69 t20 t7 t1 t31 t10 t72 t37 t30 t44 t77 t4
long t26 t75 t31 t49 t24 t41 t30 t43 t48 t8 t39 t5 t22
long t72 t68 t50 t47 t22 t18 t28 t20 t23 t2 t3 t35 t43 t59
long t4 t71 t45 t23 t67 t56 t77 t26 t35 t7 t7
long t20 t25 t7 t40 t59 t34 t2 t26 t13 t2 t18 t4 t6 t43 t39
short t26 t31 t52 t71
short t79 t13 t54 t28 t50
long t41 t8 t2 t8 t15 t59 t58 t24 t28 t22 t36 t29
mid t42 t76 t30 t52 t64 t42 t44 t0 t45 t50
long t28 t61 t21 t67 t3 t59 t76 t20 t46 t0 t27 t67 t69 t14
short t38 t35 t2 t16
short t44 t46 t77 t47 t75 t60
short t2 t52 t68
mid t23 t4 t59 t43 t4 t26 t46 t15 t67 t28
long t79 t20 t29 t43 t10 t2 t67 t37 t30 t70 t27 t39 t31
short t5 t14 t72 t41 t59
mid t60 t34 t60 t52 t57 t22 t39 t40 t18
long t28 t31 t22 t6 t17 t62 t11 t1 t66 t7 t33 t7
long t22 t75 t33 t26 t10 t55 t71 t37 t43 t36 t40 t77
long t14 t52 t43 t38 t46 t26 t5 t30 t41 t33 t1
short t52 t2 t63
mid t68 t27 t28 t51 t50 t26 t67 t64
mid t69 t76 t17 t42 t60 t30 t16 t60 t73
long t19 t60 t64 t44 t49 t32 t56 t30 t27 t62 t43 t29
mid t46 t31 t4 t29 t6 t41 t18 t55 t17
mid t26 t68 t73 t18 t63 t30 t22 t24
mid t45 t48 t58 t57 t40 t45 t57 t16
mid t49 t79 t7 t54 t17 t37 t49 t66
mid t58 t67 t37 t38 t38 t76 t40 t43
short t43 t61 t1
long t48 t69 t58 t56 t0 t9 t35 t27 t57 t39 t3
mid t34 t46 t26 t65 t24 t43 t26 t62 t71
short t71 t38 t48
mid t76 t67 t66 t63 t10 t69 t18 t1 t43
short t47 t41 t43 t36
long t70 t50 t65 t37 t0 t36 t59 t48 t72 t9 t56 t38 t66 t71 t3
short t55 t30 t61
short t61 t78 t51 t40 t1 t49
mid t70 t69 t76 t12 t21 t37 t78 t44 t50
mid t23 t72 t59 t17 t20 t10 t6 t28 t11
short t16 t24 t75
long t75 t28 t74 t70 t34 t35 t42 t35 t8 t79 t61 t50 t46 t8 t78
mid t74 t20 t24 t65 t24 t0 t41 t21
mid t9 t20 t19 t64 t35 t77 t6 t70 t11 t13
long t43 t25 t49 t46 t70 t2 t13 t58 t57 t8 t0 t75
long t5 t71 t20 t38 t14 t69 t52 t69 t2 t3 t42 t36 t25 t75 t76
mid t7 t23 t61 t51 t70 t53 t1 t0 t20
mid t33 t9 t8 t45 t34 t76 t38 t58 t39 t63
short t67 t7 t39
short t6 t72 t78 t45 t65 t25
short t57 t40 t73 t2 t3
short t20 t52 t13 t56
long t29 t31 t43 t62 t70 t18 t50 t78 t79 t12 t30 t27 t78 t23
short t71 t77 t35 t35 t37 t51
mid t49 t40 t6 t22 t34 t33 t28 t19 t43 t36
mid t66 t55 t2 t57 t35 t15 t35 t2 t41
mid t51 t43 t75 t2 t79 t38 t73 t70 t43 t34
short t51 t64 t70 t58
long t27 t13 t78 t3 t11 t62 t1 t67 t44 t10 t58
short t42 t61 t31 t18 t40 t53
mid t74 t5 t7 t8 t40 t68 t32 t39 t18 t20
mid t72 t60 t56 t33 t47 t62 t25 t74 t58 t55
short t46 t76 t60 t14 t57
short t43 t8 t78 t34 t48 t46
mid t59 t39 t68 t59 t49 t47 t78 t8
short t35 t17 t21
mid t18 t76 t22 t48 t75 t33 t37 t40
mid t79 t73 t15 t49 t5 t61 t11 t6 t9
long t7 t25 t69 t16 t26 t62 t31 t1 t6 t57 t65 t11 t28 t47 t21
mid t54 t71 t40 t10 t61 t66 t20 t33 t41 t0
short t18 t13 t19 t71 t32 t38
short t72 t18 t20
mid t4 t60 t61 t54 t46 t31 t0 t49
short t24 t51 t31 t5
long t78 t5 t4 t52 t10 t35 t36 t41 t73 t38 t72 t44
long t11 t36 t30 t78 t22 t17 t6 t28 t69 t72 t52 t35 t57
mid t71 t41 t27 t27 t25 t15 t24 t40
short t44 t75 t70 t16
mid t79 t60 t8 t28 t65 t57 t19 t22 t8
mid t14 t45 t1 t58 t47 t3 t16 t6
long t37 t49 t43 t40 t53 t47 t59 t76 t33 t36 t37 t72
long t26 t79 t44 t27 t24 t73 t40 t11 t58 t3 t72 t3 t45
mid t11 t76 t49 t78 t55 t59 t17 t25 t57 t31
short t23 t28 t19 t18
mid t75 t14 t76 t61 t47 t8 t41 t44 t36 t6
mid t6 t66 t23 t42 t17 t30 t24 t12 t61
short t72 t70 t7 t46 t31
mid t70 t42 t74 t17 t18 t66 t23 t76 t4
short t43 t47 t60 t46 t19
short t43 t6 t68
mid t32 t58 t4 t31 t75 t73 t57
mid t37 t55 t53 t29 t41 t4 t69 t33
short t40 t4 t66 t15 t6 t54
mid t54 t27 t8 t48 t29 t46 t76 t34 t53 t33
short t30 t36 t4
long t13 t10 t67 t4 t40 t27 t75 t14 t7 t11 t43 t5
mid t33 t13 t67 t14 t12 t57 t73
mid t22 t47 t61 t69 t16 t47 t35 t52 t0
long t45 t72 t46 t74 t1 t11 t42 t9 t58 t5 t8 t55 t23
long t71 t25 t74 t23 t50 t10 t53 t16 t28 t19 t61
short t42 t15 t52 t49 t23 t45
mid t36 t34 t51 t72 t35 t2 t9 t19 t61
short t9 t6 t39 t0 t58 t38
long t5 t18 t58 t72 t44 t12 t52 t67 t75 t49 t68 t69 t27 t31 t40
long t76 t49 t78 t79 t19 t52 t23 t24 t25 t26 t60 t9
mid t58 t50 t42 t37 t78 t41 t34
long t67 t51 t50 t70 t49 t74 t35 t42 t69 t23 t73 t17 t79 t34 t21
long t65 t11 t24 t34 t59 t65 t12 t29 t3 t21 t41 t27
long t22 t67 t17 t79 t76 t37 t15 t27 t37 t70 t64 t32
mid t33 t18 t52 t23 t78 t50 t38
short t31 t22 t15 t27
short t68 t34 t17 t0
long t36 t15 t47 t13 t30 t57 t29 t38 t75 t19 t2 t71 t13 t12 t69
short t58 t50 t17 t58
long t32 t1 t28 t13 t13 t42 t72 t46 t9 t51 t37
long t54 t75 t13 t78 t39 t52 t27 t79 t78 t42 t24 t16
long t58 t22 t55 t3 t51 t64 t69 t4 t41 t52 t70 t61 t28
long t63 t44 t29 t4 t4 t24 t13 t56 t21 t26 t31
long t61 t11 t16 t32 t52 t17 t73 t38 t26 t68 t11 t19 t5
mid t31 t31 t46 t51 t12 t62 t7 t59
short t53 t48 t74 t67 t62
long t69 t8 t6 t4 t44 t60 t10 t72 t59 t60 t8 t40 t6
short t49 t7 t53
short t30 t3 t52 t20
long t34 t61 t75 t30 t62 t26 t49 t67 t27 t41 t61
mid t8 t2 t52 t19 t20 t10 t20 t29 t49
long t61 t8 t48 t13 t52 t35 t4 t33 t42 t68 t40
short t49 t45 t18 t34 t58 t9
short t43 t4 t41 t2 t43
long t33 t57 t64 t28 t55 t69 t6 t20 t56 t9 t55 t75 t35 t10
mid t3 t39 t46 t61 t11 t31 t73 t60 t65
short t70 t71 t73 t14 t13 t20
long t71 t3 t2 t12 t38 t14 t46 t37 t66 t5 t9 t33 t23 t58
short t33 t16 t8
mid t27 t56 t27 t42 t62 t64 t24
short t11 t76 t70 t43 t66 t1
long t41 t26 t67 t59 t9 t71 t16 t33 t56 t65 t9 t66 t20 t46
mid t18 t18 t4 t65 t56 t15 t4 t45
mid t46 t23 t15 t8 t32 t10 t20 t67 t10
long t48 t41 t64 t70 t53 t71 t75 t18 t64 t73 t26
long t2 t46 t6 t17 t56 t12 t6 t13 t9 t47 t35 t77 t17 t14 t57
short t45 t42 t30
short t36 t21 t20 t58 t77
long t42 t74 t78 t14 t15 t27 t25 t32 t64 t63 t28 t9
long t42 t57 t42 t68 t21 t53 t42 t41 t27 t2 t49 t71 t2 t72 t70
short t55 t22 t42 t50 t39 t6
short t10 t33 t70 t48 t51
short t17 t67 t10 t51
short t62 t75 t25 t7
long t69 t52 t4 t51 t71 t17 t13 t32 t65 t53 t37 t69 t6 t72 t68
long t7 t11 t26 t50 t20 t51 t1 t54 t79 t70 t11 t1 t61 t67 t12
short t7 t4 t39
mid t48 t61 t22 t16 t16 t62 t24 t61
long t50 t62 t40 t2 t12 t57 t38 t34 t50 t35 t11
long t18 t13 t7 t71 t66 t59 t17 t59 t35 t60 t40 t44 t47 t13 t38
mid t57 t6 t32 t45 t51 t33 t38
mid t73 t6 t3 t18 t62 t10 t29
short t56 t50 t51
mid t24 t17 t54 t56 t50 t70 t71 t67
short t18 t2 t23 t63 t70
mid t47 t2 t9 t18 t14 t34 t48 t18
mid t55 t38 t59 t58 t42 t27 t8 t65 t14
long t18 t68 t25 t24 t55 t69 t70 t71 t11 t21 t39
mid t36 t14 t28 t15 t63 t18 t19
short t3 t68 t7 t44 t11 t29
short t16 t40 t55 t59 t17
short t74 t2 t2 t25 t18 t30
mid t47 t67 t8 t36 t0 t21 t20 t64
long t61 t55 t14 t48 t73 t52 t51 t14 t55 t20 t61
long t10 t5 t24 t26 t39 t48 t78 t60 t70 t7 t61 t6 t10 t37
mid t49 t26 t57 t61 t15 t69 t22 t71 t69
short t31 t68 t29 t53 t48
mid t20 t27 t68 t60 t10 t38 t8
mid t60 t48 t52 t33 t50 t66 t69 t47 t37 t37
long t52 t35 t8 t6 t50 t18 t3 t10 t76 t24 t31
mid t34 t49 t70 t78 t69 t9 t9 t55 t40
short t59 t56 t18 t29 t51 t51
short t48 t28 t76 t68
long t76 t1 t42 t51 t22 t70 t7 t54 t75 t25 t52 t66 t56 t34 t28
long t72 t56 t14 t3 t0 t25 t73 t19 t7 t49 t56 t19
long t52 t61 t58 t63 t34 t57 t73 t6 t16 t2 t8 t65 t61 t64
short t8 t58 t45 t66
mid t19 t9 t51 t50 t34 t51 t71 t54 t44 t17
short t19 t46 t71 t44 t70 t29
long t47 t61 t60 t50 t42 t13 t38 t68 t38 t23 t48 t23 t49 t41
short t64 t25 t9 t8
short t19 t23 t45
long t42 t78 t34 t3 t51 t41 t10 t40 t19 t45 t73
short t79 t7 t52 t9 t27
mid t65 t75 t57 t47 t4 t51 t12 t76 t50
mid t43 t32 t34 t59 t63 t47 t6 t57
mid t54 t73 t19 t18 t20 t21 t17 t44 t71 t78
long t32 t32 t29 t1 t4 t76 t36 t15 t40 t44 t57
long t37 t12 t79 t1 t23 t63 t52 t20 t23 t78 t13 t66 t14
mid t74 t33 t52 t34 t4 t20 t47 t70 t79
mid t16 t78 t37 t11 t20 t67 t12
mid t6 t3 t9 t37 t57 t29 t50 t4 t24 t67
long t60 t0 t65 t53 t69 t59 t48 t30 t12 t1 t46 t78
mid t1 t17 t33 t30 t22 t79 t41
long t9 t72 t63 t18 t27 t45 t31 t37 t42 t78 t21 t23
short t26 t65 t17
mid t64 t51 t1 t62 t48 t72 t5 t43 t18 t39
short t47 t18 t64 t49 t0
short t51 t7 t45 t77 t31
mid t27 t24 t19 t60 t36 t49 t7 t36
long t39 t44 t67 t9 t56 t64 t9 t27 t17 t17 t66 t18 t41
long t49 t70 t60 t44 t19 t47 t20 t18 t0 t67 t73 t78 t53 t13 t70
long t23 t49 t37 t52 t64 t32 t56 t25 t16 t69 t40 t61
mid t14 t14 t54 t60 t7 t34 t12 t63 t62 t67
mid t42 t66 t53 t73 t29 t6 t23 t64 t18 t73
long t56 t56 t78 t43 t11 t14 t56 t74 t57 t59 t20 t58 t59 t63
long t58 t5 t49 t56 t39 t0 t55 t60 t25 t70 t24 t25 t17 t59 t2
short t17 t49 t47 t15
short t18 t51 t50 t4 t79
short t23 t5 t50 t76 t7 t58
short t59 t59 t27
mid t70 t29 t77 t13 t55 t39 t2
short t41 t25 t6 t48 t57
mid t54 t64 t12 t51 t60 t39 t27 t43 t57 t11
short t77 t48 t61
long t31 t8 t26 t30 t71 t34 t69 t32 t29 t16 t53 t2
long t74 t28 t19 t31 t58 t28 t12 t48 t10 t34 t51 t56 t41
long t4 t30 t34 t35 t61 t29 t53 t70 t22 t73 t47 t77 t20
mid t25 t7 t34 t13 t22 t38 t25 t49 t19
long t67 t14 t39 t4 t1 t36 t76 t57 t58 t64 t27
short t11 t10 t48 t26 t72
short t59 t19 t21 t15 t62
long t73 t10 t40 t40 t16 t51 t38 t46 t2 t41 t19 t65
long t32 t5 t6 t76 t19 t5 t51 t40 t5 t22 t46 t66 t26 t28 t66
mid t34 t27 t19 t50 t45 t12 t0 t26 t11
long t32 t31 t36 t35 t50 t39 t55 t13 t13 t42 t76 t8 t58 t60 t68
short t19 t59 t44 t40 t31 t72
short t4 t21 t56 t35
mid t9 t30 t32 t79 t47 t9 t47 t52 t7 t60
mid t69 t78 t21 t22 t52 t0 t0 t51
short t66 t27 t50 t36 t8
mid t17 t12 t69 t42 t2 t69 t51 t70
long t71 t45 t39 t77 t30 t10 t79 t3 t65 t68 t7
mid t68 t3 t20 t28 t0 t50 t8 t36 t47
long t14 t14 t66 t52 t15 t27 t71 t72 t71 t31 t4 t37
short t7 t71 t51
mid t44 t31 t54 t69 t59 t4 t23 t47
long t58 t64 t43 t66 t67 t54 t70 t23 t17 t74 t41 t50 t77
mid t49 t35 t75 t3 t74 t43 t78 t34 t34
short t25 t11 t36
long t45 t59 t39 t76 t44 t14 t1 t18 t22 t18 t13
mid t37 t70 t58 t13 t71 t1 t12 t68 t34 t50
mid t75 t68 t13 t33 t52 t75 t58 t21
short t61 t41 t49 t28 t3 t6
long t16 t38 t1 t35 t67 t6 t31 t47 t27 t28 t15 t19 t67 t73
mid t6 t75 t61 t48 t28 t13 t32 t69 t59 t66
long t52 t58 t56 t42 t4 t63 t50 t47 t53 t5 t32 t79 t74
long t72 t67 t5 t66 t73 t42 t43 t44 t14 t23 t57
long t59 t45 t10 t0 t50 t13 t30 t40 t69 t73 t21 t15 t31 t5
short t57 t13 t67
short t41 t32 t10 t59 t67
long t6 t64 t55 t16 t19 t41 t20 t58 t13 t60 t54 t21
mid t16 t14 t28 t78 t52 t57 t7
short t23 t76 t41 t16 t33
mid t71 t44 t53 t37 t73 t51 t55 t73 t78 t65
long t44 t53 t76 t34 t41 t10 t65 t23 t21 t17 t21 t39
short t49 t71 t14 t79 t45 t47
short t31 t78 t19 t38 t50 t20
long t10 t69 t53 t5 t52 t32 t66 t18 t76 t39 t27 t9
long t70 t46 t9 t43 t33 t79 t27 t77 t73 t57 t24 t7
mid t59 t50 t6 t39 t16 t15 t47 t47 t20 t8
long t9 t40 t39 t53 t45 t15 t46 t41 t27 t38 t51 t33 t15 t77 t56
long t77 t38 t5 t24 t68 t17 t42 t20 t58 t26 t78 t28 t11
short t6 t79 t18 t74
short t63 t77 t57 t24 t19
mid t55 t20 t23 t42 t75 t42 t47 t17 t43
long t70 t75 t44 t8 t21 t62 t78 t62 t8 t77 t16
mid t47 t48 t38 t23 t38 t58 t18 t17
mid t15 t25 t1 t57 t59 t34 t71 t6
long t57 t27 t60 t70 t12 t59 t53 t27 t76 t49 t7
long t2 t43 t34 t35 t32 t11 t0 t22 t50 t0 t78 t47 t64
mid t2 t2 t22 t64 t30 t41 t52 t56 t11 t51
mid t46 t40 t24 t73 t43 t44 t67
short t58 t19 t68 t7
short t38 t23 t22
short t34 t40 t5 t74 t49 t60
long t17 t69 t4 t23 t20 t23 t44 t47 t21 t11 t74 t58
short t38 t57 t55 t48 t70 t17
long t58 t66 t64 t61 t24 t7 t39 t54 t7 t1 t45 t11 t41 t28
mid t56 t12 t63 t69 t11 t77 t14 t25 t69
long t34 t58 t79 t47 t42 t66 t2 t64 t63 t14 t57
long t7 t13 t33 t10 t59 t78 t2 t74 t25 t63 t52
mid t79 t55 t10 t36 t29 t68 t36
short t38 t32 t45 t25 t34 t58
short t38 t8 t28 t3 t51 t57
short t2 t13 t45 t42
mid t11 t12 t49 t1 t71 t71 t31 t74
mid t32 t61 t42 t33 t53 t71 t3 t79
short t73 t72 t7
short t74 t46 t0 t18 t0 t11
mid t2 t26 t18 t10 t9 t65 t3 t46 t10 t15
long t71 t30 t49 t65 t71 t53 t74 t58 t67 t39 t61
mid t4 t35 t32 t18 t10 t15 t28 t35 t52 t41
mid t45 t57 t71 t7 t59 t55 t74 t42
long t23 t36 t13 t41 t71 t39 t54 t37 t70 t5 t37 t62 t62 t6
mid t31 t36 t39 t58 t13 t50 t19
long t51 t56 t63 t28 t63 t66 t45 t56 t1 t39 t0 t49 t21 t7 t24
long t41 t70 t29 t13 t41 t49 t11 t45 t55 t47 t61 t16 t56
mid t9 t47 t69 t10 t68 t44 t21 t56
mid t10 t44 t79 t18 t23 t11 t54 t27 t53
long t73 t47 t62 t4 t17 t12 t37 t28 t32 t59 t5 t52 t6 t46
short t73 t59 t40 t59 t26 t68
mid t12 t3 t7 t58 t23 t55 t4 t0 t18
long t53 t78 t53 t77 t3 t52 t31 t41 t17 t2 t50 t16 t5
long t22 t31 t7 t70 t27 t71 t23 t75 t27 t7 t67 t3 t53 t14 t25
short t22 t46 t46
mid t56 t15 t30 t27 t7 t61 t58 t41 t57 t4
long t40 t38 t21 t32 t16 t24 t15 t42 t46 t2 t7
short t13 t73 t22 t59 t26 t12
short t65 t34 t71 t24 t45 t52
mid t7 t43 t17 t8 t23 t68 t32 t23 t64
long t5 t75 t78 t70 t34 t9 t21 t30 t31 t64 t9 t31
long t19 t51 t19 t1 t25 t53 t23 t28 t11 t46 t26 t52
short t52 t37 t56
mid t56 t16 t0 t0 t75 t1 t38
mid t20 t67 t12 t57 t62 t69 t77 t48 t3
long t30 t59 t8 t57 t67 t47 t73 t10 t69 t77 t3
mid t19 t23 t49 t28 t45 t23 t13
long t69 t49 t66 t55 t8 t43 t79 t70 t13 t17 t7 t56
short t13 t51 t24 t73
mid t39 t31 t67 t49 t46 t1 t52 t6 t1 t39
short t73 t11 t46 t55 t33 t24
long t38 t70 t49 t79 t70 t58 t14 t65 t40 t57 t0 t68 t24 t74 t24
mid t51 t54 t62 t32 t50 t31 t12 t62 t53 t64
short t26 t53 t77 t10
mid t9 t3 t13 t45 t9 t24 t73 t35 t30 t29
mid t15 t18 t0 t19 t54 t45 t57 t64
short t22 t79 t25
short t1 t41 t46 t76
short t70 t73 t54 t16 t40 t50
short t20 t49 t79 t5
long t8 t25 t76 t43 t48 t68 t0 t75 t30 t19 t7
mid t53 t20 t73 t54 t45 t6 t79 t40
short t53 t26 t49
mid t67 t1 t57 t48 t19 t28 t0
mid t17 t65 t4 t33 t14 t17 t62 t37 t18
short t19 t23 t69 t30 t2
long t14 t20 t52 t33 t47 t75 t44 t53 t38 t11 t7 t75
long t0 t60 t34 t9 t51 t33 t20 t49 t46 t72 t39 t42 t33
short t30 t29 t32 t54 t13
long t72 t5 t53 t70 t26 t26 t22 t19 t53 t21 t31 t48 t3 t71 t78
mid t19 t22 t1 t14 t40 t73 t78 t59 t39
long t50 t38 t52 t21 t67 t19 t64 t18 t35 t69 t62 t8 t22 t15 t59
short t37 t58 t13 t15
mid t15 t3 t62 t16 t51 t47 t7 t77 t22
long t19 t37 t55 t38 t25 t55 t14 t74 t39 t13 t5 t23
short t57 t52 t73 t53 t76 t79
short t50 t75 t78
short t11 t68 t32 t30 t5
short t15 t76 t69 t4
long t23 t29 t51 t36 t24 t2 t26 t20 t61 t55 t51 t13
long t43 t66 t3 t35 t66 t6 t9 t79 t40 t11 t59 t34 t44 t52 t60
mid t33 t55 t3 t3 t4 t22 t16
long t12 t25 t38 t66 t31 t45 t36 t66 t53 t21 t55 t75
long t60 t6 t62 t18 t34 t57 t33 t52 t12 t28 t14 t46 t69
short t52 t72 t16 t31 t68
long t2 t12 t47 t73 t68 t15 t11 t6 t39 t50 t17 t11 t42 t33
mid t58 t20 t68 t34 t46 t77 t11 t28
mid t51 t64 t34 t69 t42 t66 t27 t38 t49 t72
long t30 t41 t77 t14 t5 t31 t23 t17 t71 t31 t22 t38 t22 t73 t77
long t67 t49 t55 t42 t73 t52 t21 t15 t53 t36 t8 t77 t1 t74 t79
mid t11 t38 t32 t1 t26 t48 t46
mid t59 t58 t26 t4 t41 t77 t67
short t40 t41 t28 t26 t1 t68
short t21 t27 t59 t23 t56
mid t57 t66 t37 t77 t73 t24 t46 t48 t24 t75
short t35 t11 t25 t79 t51
mid t37 t9 t50 t79 t68 t53 t18 t51 t46 t14
mid t74 t15 t70 t39 t27 t0 t57 t24 t2
long t67 t60 t1 t25 t30 t0 t49 t59 t45 t38 t44 t45
short t11 t73 t68 t44
short t29 t38 t54
long t56 t39 t55 t1 t77 t60 t67 t21 t48 t41 t20 t26 t32 t46
long t68 t19 t61 t6 t18 t77 t48 t75 t57 t61 t54 t55
long t48 t35 t12 t59 t74 t67 t33 t46 t4 t43 t26
mid t16 t36 t0 t33 t71 t31 t76
mid t59 t68 t33 t17 t36 t6 t28
long t16 t19 t4 t21 t51 t11 t8 t58 t21 t70 t5 t73
long t11 t40 t36 t63 t11 t69 t4 t57 t55 t43 t68 t77 t12 t49 t43
short t6 t49 t56 t63
mid t41 t12 t57 t42 t61 t27 t31 t73
short t45 t31 t2 t17 t70 t62
long t26 t74 t52 t39 t11 t65 t5 t51 t22 t65 t71 t18 t76 t58
short t76 t63 t69 t74
mid t13 t29 t46 t31 t25 t8 t26 t21
long t75 t48 t24 t1 t49 t50 t48 t73 t44 t51 t18 t79 t31 t17
short t46 t59 t17 t57
long t49 t19 t71 t59 t52 t28 t71 t76 t44 t56 t18 t8 t30 t60 t54
short t49 t75 t73
short t63 t55 t27 t48
long t37 t57 t3 t18 t10 t36 t39 t60 t25 t46 t19 t40 t30
short t74 t47 t41 t21 t54 t72
short t33 t41 t52 t33 t35
short t47 t69 t14 t61 t62
long t28 t1 t41 t77 t11 t14 t74 t79 t58 t56 t36
short t57 t45 t18 t32 t54 t13
long t10 t63 t47 t46 t1 t72 t5 t5 t31 t36 t41 t72 t61
long t22 t63 t18 t67 t17 t76 t51 t38 t27 t0 t56 t56 t68
short t50 t25 t16 t13 t5
mid t64 t7 t20 t52 t58 t39 t35 t57 t53 t0
mid t54 t77 t2 t53 t31 t21 t67 t50 t70
short t46 t26 t56
long t1 t0 t10 t31 t66 t6 t36 t32 t27 t76 t41 t35 t61
mid t20 t21 t29 t16 t38 t11 t0 t79 t27 t31
mid t79 t42 t58 t68 t36 t59 t43
long t29 t56 t32 t46 t53 t42 t4 t4 t20 t76 t52 t31 t9
mid t3 t36 t14 t41 t25 t62 t47 t45 t0 t43
short t40 t5 t16 t68 t60 t22
long t11 t10 t69 t23 t42 t32 t54 t77 t63 t71 t55
long t54 t44 t56 t10 t48 t13 t22 t8 t78 t10 t31 t12
short t41 t36 t40 t59 t35 t18
short t67 t52 t40 t14 t64
short t28 t49 t75 t51 t60 t34
short t53 t55 t21 t3
short t18 t60 t64
short t21 t47 t77
mid t1 t54 t5 t78 t23 t79 t52 t52 t54 t61
long t27 t37 t32 t20 t15 t56 t29 t13 t31 t55 t5 t15 t56 t62 t4
short t75 t16 t61 t49 t32 t23
short t27 t53 t57 t22 t19
short t72 t61 t76
long t5 t49 t8 t69 t48 t1 t72 t18 t33 t29 t22
long t49 t18 t12 t64 t29 t75 t0 t63 t46 t45 t71 t14 t12 t66 t18
mid t57 t59 t49 t1 t10 t31 t37 t30 t9 t30
mid t34 t55 t79 t21 t36 t53 t69
mid t10 t38 t25 t32 t43 t20 t36 t2 t26
short t43 t10 t22 t44 t2 t31
long t8 t65 t78 t9 t72 t76 t6 t56 t52 t0 t62 t36 t31
mid t28 t16 t22 t19 t1 t7 t3
short t77 t2 t40 t57 t71 t24
long t72 t54 t18 t73 t36 t66 t73 t39 t75 t40 t13 t15 t23
long t68 t74 t7 t66 t51 t29 t43 t72 t55 t15 t53
long t27 t1 t17 t45 t16 t68 t46 t26 t3 t73 t21
long t30 t62 t55 t4 t2 t10 t4 t33 t39 t45 t43
mid t0 t29 t70 t68 t63 t39 t38 t44
short t74 t63 t45 t74
short t37 t16 t68
long t67 t67 t18 t62 t24 t14 t15 t31 t58 t10 t65 t67 t39 t50 t33
mid t49 t40 t18 t69 t19 t14 t79 t31 t12 t75
mid t18 t16 t35 t25 t58 t63 t70 t71
short t55 t27 t62 t20
short t59 t60 t46 t59 t11
mid t33 t72 t28 t56 t34 t17 t2
long t37 t52 t13 t74 t56 t1 t9 t73 t14 t38 t50 t44 t31 t39 t33
long t17 t74 t48 t17 t32 t37 t5 t75 t78 t52 t45 t14 t38
long t47 t51 t48 t70 t54 t47 t46 t0 t39 t41 t78 t36 t27
mid t55 t74 t18 t79 t71 t29 t22 t39
long t27 t40 t12 t0 t33 t62 t26 t46 t60 t17 t21 t10 t17 t64 t35
mid t21 t27 t36 t48 t54 t58 t67 t57 t41 t67
long t3 t18 t46 t54 t39 t56 t62 t64 t78 t46 t71 t11 t52
short t10 t21 t28 t17
short t66 t0 t56 t22
short t46 t66 t22 t46 t19
mid t53 t74 t39 t44 t31 t32 t17 t19 t41 t43
short t50 t43 t13 t61 t67
short t72 t12 t15 t66 t49
long t72 t21 t9 t17 t57 t14 t51 t41 t29 t17 t79
short t64 t39 t8
short t31 t20 t79
mid t27 t38 t16 t18 t72 t15 t69 t37 t74 t4
short t20 t64 t72
mid t54 t32 t22 t0 t70 t0 t35
long t64 t32 t73 t65 t47 t40 t74 t64 t24 t39 t76 t39 t1
long t66 t31 t79 t36 t29 t12 t60 t76 t65 t67 t15 t66 t60
short t22 t79 t64 t75
long t15 t66 t61 t23 t26 t58 t2 t7 t7 t17 t13
mid t23 t2 t78 t14 t36 t39 t11 t63
mid t38 t71 t18 t25 t50 t63 t4
mid t8 t37 t52 t42 t64 t28 t26
long t31 t28 t42 t55 t0 t16 t15 t64 t51 t62 t0 t50
short t21 t61 t14 t69 t22
long t57 t5 t10 t60 t5 t73 t0 t60 t59 t25 t3
mid t66 t50 t28 t7 t59 t58 t51 t24 t19
short t35 t38 t29 t22
long t60 t78 t53 t69 t16 t60 t46 t75 t0 t33 t62 t71 t66
long t38 t31 t13 t67 t29 t35 t6 t75 t50 t33 t77
long t1 t53 t74 t78 t4 t2 t9 t72 t74 t43 t28 t76 t76 t52
mid t55 t32 t39 t43 t37 t32 t27
mid t42 t2 t23 t44 t64 t34 t2 t34
long t74 t1 t28 t1 t75 t38 t5 t27 t53 t19 t16 t78 t53 t3 t74
mid t23 t36 t15 t72 t51 t44 t58 t70
long t27 t17 t28 t29 t3 t64 t68 t29 t35 t38 t74 t41 t64 t10
long t21 t32 t48 t71 t61 t55 t8 t79 t44 t39 t3 t76 t20 t53 t0
long t30 t52 t64 t8 t49 t57 t39 t47 t74 t45 t67 t26 t53 t53 t39
short t66 t79 t55 t36
short t52 t9 t8 t60 t36
short t7 t10 t71 t59 t28
mid t47 t6 t13 t19 t34 t35 t79 t44 t9
short t66 t74 t8 t16 t44 t51
short t31 t65 t61 t58
long t18 t64 t12 t50 t18 t67 t7 t52 t15 t24 t7 t25
mid t43 t32 t28 t63 t33 t54 t73 t48
long t12 t47 t73 t10 t6 t76 t62 t17 t76 t24 t35 t28 t31 t74 t56
long t74 t50 t40 t0 t8 t71 t43 t55 t78 t14 t43
long t15 t37 t25 t34 t9 t6 t38 t22 t22 t34 t37 t40 t4
long t44 t36 t71 t1 t67 t45 t37 t57 t4 t66 t32 t27 t51 t56 t57
mid t70 t51 t21 t23 t61 t8 t51 t74 t65 t29
short t41 t76 t38
short t71 t9 t12 t0 t17
long t70 t35 t62 t57 t57 t17 t5 t14 t48 t8 t45 t79
mid t33 t17 t44 t7 t0 t78 t40
long t23 t14 t0 t77 t7 t51 t22 t41 t8 t37 t46 t30 t72 t20 t52
long t73 t47 t71 t78 t24 t22 t19 t2 t51 t62 t46 t2 t67 t31
short t16 t61 t68
long t6 t2 t43 t65 t9 t56 t78 t73 t52 t15 t72 t2 t46 t15 t67
long t11 t27 t60 t78 t48 t14 t78 t74 t48 t42 t11 t11
short t13 t15 t5 t4 t50 t3
mid t62 t61 t39 t25 t12 t20 t22
short t29 t13 t40 t79 t72
mid t65 t50 t37 t15 t33 t40 t7 t55
mid t7 t36 t57 t77 t60 t69 t34 t62 t71 t16
long t54 t56 t63 t57 t42 t58 t16 t58 t34 t6 t20 t44
long t41 t79 t40 t67 t32 t53 t45 t34 t72 t27 t23
long t40 t31 t46 t50 t19 t65 t23 t64 t51 t50 t68 t1
short t10 t59 t15 t51 t77
short t37 t47 t48 t71 t7 t5
short t58 t22 t48 t31 t33
long t9 t7 t1 t68 t39 t24 t12 t15 t9 t9 t56 t53 t76 t62 t26
long t78 t31 t13 t29 t63 t28 t43 t55 t54 t70 t29 t58 t75 t71
long t13 t53 t14 t45 t18 t40 t7 t0 t61 t31 t67 t46 t11 t41
long t2 t79 t33 t53 t67 t58 t5 t13 t79 t8 t20 t9 t78 t11 t63
mid t45 t60 t61 t4 t46 t23 t64 t58
mid t46 t28 t10 t8 t75 t21 t61 t10 t58
mid t72 t59 t25 t20 t27 t17 t20
mid t36 t76 t60 t75 t66 t38 t50 t35 t68 t49
long t75 t8 t26 t18 t65 t67 t75 t69 t38 t30 t72 t67 t11 t5 t4
short t34 t24 t74 t22
mid t1 t37 t73 t46 t78 t18 t28 t5 t44 t48
short t10 t33 t32 t22 t8 t67
long t27 t12 t54 t55 t25 t6 t36 t3 t70 t79 t54 t11
short t74 t13 t26
mid t76 t78 t36 t4 t47 t65 t32 t30
mid t1 t9 t11 t79 t60 t19 t25 t4
short t58 t27 t79 t22 t58 t6
mid t65 t1 t32 t48 t79 t65 t28 t22
short t5 t49 t66
long t27 t12 t76 t65 t37 t9 t30 t33 t21 t72 t47 t31 t64 t33
short t1 t21 t19
long t42 t68 t57 t2 t1 t0 t19 t11 t6 t28 t42 t6
short t77 t66 t8 t3 t78 t13
short t58 t42 t28
mid t10 t78 t29 t65 t49 t42 t25 t53 t74 t24
short t17 t12 t72 t68
short t42 t30 t47 t6 t40
long t29 t38 t30 t42 t77 t18 t34 t43 t24 t73 t54
mid t7 t21 t2 t0 t77 t60 t63 t1 t20 t34
long t19 t25 t26 t12 t26 t51 t76 t76 t52 t28 t78 t26
mid t52 t49 t72 t41 t60 t16 t16
mid t23 t38 t36 t3 t26 t28 t47
long t76 t54 t60 t20 t7 t17 t28 t26 t31 t20 t36 t54
mid t29 t64 t61 t69 t62 t26 t15 t12 t54
long t12 t14 t17 t27 t3 t75 t45 t54 t32 t19 t75 t72 t37 t54 t54
mid t6 t67 t0 t21 t22 t10 t6 t68 t72
short t12 t59 t76 t63 t4
mid t63 t17 t11 t58 t17 t7 t42 t77 t22 t41
long t29 t50 t46 t13 t30 t77 t40 t25 t71 t33 t66 t11 t67
mid t54 t8 t32 t41 t78 t3 t57 t76
mid t36 t54 t61 t43 t60 t62 t11 t8 t74
short t57 t40 t54 t40
short t77 t67 t57
long t13 t7 t71 t19 t70 t47 t53 t24 t64 t34 t53 t62
short t30 t54 t56
short t2 t32 t46 t25 t12 t4
short t70 t10 t29
mid t69 t30 t32 t57 t15 t51 t42
short t63 t40 t19 t61 t50
long t27 t13 t1 t54 t44 t79 t67 t74 t19 t57 t1 t71 t48 t29
short t36 t59 t79
short t48 t24 t47
short t12 t37 t75 t26 t55 t14
long t8 t19 t8 t43 t46 t73 t49 t72 t14 t11 t29 t53 t35 t65 t39
long t42 t49 t72 t43 t0 t59 t67 t12 t28 t52 t53 t41
long t75 t1 t54 t35 t49 t25 t3 t38 t4 t0 t52 t27 t10 t36 t68
mid t66 t0 t29 t16 t69 t76 t67 t75 t31 t60
mid t75 t2 t22 t39 t22 t44 t61
long t48 t59 t6 t33 t50 t4 t77 t34 t73 t57 t0 t46
long t53 t10 t66 t8 t10 t30 t25 t14 t77 t47 t62 t54 t60
long t40 t68 t30 t10 t17 t3 t22 t33 t75 t9 t73 t68 t36
mid t50 t38 t23 t1 t63 t7 t33
long t77 t48 t49 t26 t79 t60 t19 t28 t25 t44 t77 t7 t4
long t12 t28 t6 t0 t10 t3 t49 t54 t47 t9 t67 t2 t8 t56 t40
short t45 t5 t40
long t34 t12 t55 t14 t76 t40 t76 t4 t73 t43 t36 t35 t18
mid t13 t65 t37 t67 t48 t19 t26 t39 t77 t24
mid t13 t51 t63 t45 t20 t58 t71
mid t14 t36 t5 t13 t12 t65 t28
long t32 t2 t24 t7 t20 t53 t2 t37 t51 t39 t10 t63
mid t52 t12 t58 t42 t2 t21 t46 t66 t26 t51
long t76 t28 t67 t41 t10 t50 t45 t21 t26 t45 t61 t62 t16 t63
short t21 t41 t35
long t69 t70 t22 t74 t47 t68 t58 t31 t73 t14 t31
mid t35 t71 t50 t55 t49 t21 t76
short t68 t48 t13 t76
mid t31 t32 t77 t45 t46 t25 t53 t17 t44 t52
long t50 t0 t72 t52 t0 t77 t30 t17 t25 t32 t4 t33 t52 t63
long t18 t35 t28 t65 t59 t50 t14 t79 t0 t21 t75 t77
long t50 t78 t72 t46 t71 t66 t29 t0 t38 t75 t63 t18
short t71 t43 t3 t47 t77
mid t42 t18 t13 t20 t14 t60 t33
mid t24 t16 t71 t23 t48 t33 t74 t14 t68
long t65 t44 t47 t75 t4 t29 t2 t67 t12 t14 t32 t42 t16 t63 t58
mid t52 t9 t59 t10 t55 t39 t78 t79 t19 t49
mid t18 t41 t17 t52 t34 t60 t49 t27 t13 t79
long t75 t33 t21 t3 t56 t29 t40 t72 t0 t8 t14 t60 t6 t36 t41
mid t19 t65 t11 t28 t47 t37 t70 t11 t61 t18
mid t59 t55 t66 t9 t39 t30 t0 t64
long t16 t73 t0 t22 t40 t58 t57 t5 t59 t69 t73 t77 t52 t25
long t14 t50 t44 t14 t2 t41 t76 t49 t58 t39 t7 t8 t11 t65 t47
short t63 t18 t16 t37 t1 t7
short t12 t19 t57 t37
short t15 t40 t17 t11 t77 t36
long t46 t70 t9 t38 t29 t22 t33 t43 t28 t37 t12 t37 t32 t41 t64
long t70 t45 t55 t46 t42 t74 t72 t60 t46 t40 t45 t30
long t72 t47 t3 t32 t10 t11 t23 t4 t59 t57 t64
mid t1 t54 t47 t77 t24 t49 t40 t71
long t24 t3 t56 t46 t7 t45 t48 t9 t70 t21 t10 t50 t16 t51
mid t38 t3 t45 t76 t6 t13 t30 t8
mid t42 t26 t3 t2 t63 t54 t65 t53
mid t65 t15 t29 t10 t37 t36 t19
mid t78 t30 t78 t30 t57 t37 t45
short t52 t57 t48 t47
long t77 t6 t31 t45 t46 t75 t53 t26 t62 t62 t35 t55
mid t12 t11 t61 t3 t3 t6 t50 t24 t39
mid t54 t42 t34 t52 t2 t23 t67 t41 t76
long t55 t40 t3 t10 t67 t18 t73 t36 t72 t29 t18 t34
short t58 t14 t54
short t11 t69 t65 t21
long t79 t21 t21 t78 t20 t26 t22 t43 t13 t38 t49 t34 t29
long t4 t45 t21 t79 t2 t6 t78 t60 t64 t67 t42 t42
mid t0 t32 t63 t61 t69 t5 t73
mid t61 t14 t58 t55 t16 t30 t29 t25
long t64 t1 t8 t1 t77 t59 t17 t58 t2 t31 t33 t76
mid t57 t16 t26 t63 t52 t68 t53
long t35 t11 t10 t71 t79 t14 t45 t69 t31 t75 t4 t3
long t5 t52 t2 t36 t39 t1 t56 t8 t39 t33 t15 t69 t39 t61 t0
long t76 t34 t6 t41 t5 t70 t4 t29 t71 t79 t41 t34
long t34 t21 t21 t31 t42 t45 t44 t40 t25 t70 t2 t69 t69
mid t64 t14 t46 t65 t62 t47 t70 t48 t76 t38
long t43 t68 t30 t50 t22 t65 t4 t46 t71 t21 t18 t48
short t22 t63 t15 t14
mid t5 t24 t5 t56 t66 t13 t37
mid t63 t20 t74 t18 t66 t71 t35 t1 t45
short t74 t68 t39 t50 t20
long t69 t19 t54 t39 t61 t47 t23 t20 t35 t34 t15
short t56 t20 t60 t22 t27
mid t7 t65 t27 t12 t13 t6 t40 t75 t26
mid t74 t77 t18 t17 t8 t78 t17
short t62 t21 t65
mid t54 t7 t76 t20 t18 t66 t41 t70 t61
mid t25 t78 t59 t76 t70 t43 t55 t11 t75
mid t8 t67 t12 t34 t10 t48 t45 t51 t23 t79
long t25 t57 t1 t75 t23 t54 t17 t59 t9 t20 t33 t49 t26 t42 t75
long t46 t11 t0 t71 t20 t48 t25 t38 t38 t62 t8 t33 t38 t10
short t44 t43 t24 t77 t36 t45
long t2 t15 t50 t30 t15 t64 t23 t11 t75 t23 t30
mid t51 t16 t45 t59 t50 t47 t54 t15
mid t19 t57 t69 t63 t14 t58 t73
mid t45 t43 t11 t31 t9 t25 t41
long t73 t20 t38 t2 t18 t44 t29 t49 t46 t29 t57 t32 t78 t10
short t5 t54 t28 t53 t8
mid t79 t32 t34 t24 t76 t4 t28 t77 t29 t50
short t12 t4 t19 t79
long t72 t5 t45 t12 t32 t41 t12 t19 t31 t76 t39 t72
short t77 t54 t55 t32
long t38 t73 t5 t12 t58 t61 t43 t75 t52 t1 t49
long t14 t20 t49 t40 t44 t20 t16 t52 t56 t15 t52 t20 t17
short t49 t6 t56 t71 t30
long t47 t14 t26 t71 t54 t68 t15 t35 t10 t63 t19 t69 t45 t13
long t72 t23 t61 t58 t42 t52 t32 t74 t27 t2 t21 t74 t43 t66
long t35 t30 t20 t15 t69 t36 t6 t9 t76 t33 t11 t72 t63 t37 t75
mid t17 t40 t3 t79 t12 t1 t56 t9 t15 t37
mid t70 t35 t14 t13 t13 t64 t61
long t10 t27 t24 t58 t0 t41 t26 t14 t42 t38 t31 t3 t67 t7 t69
long t37 t14 t61 t51 t45 t68 t69 t10 t1 t17 t17
long t41 t68 t35 t23 t69 t76 t56 t23 t49 t77 t63 t17
mid t33 t66 t66 t25 t9 t11 t44
short t33 t71 t45 t16 t71 t14
long t76 t12 t74 t28 t36 t49 t10 t50 t62 t32 t0 t36 t16
short t28 t72 t22 t67
long t76 t76 t16 t77 t35 t31 t14 t2 t52 t28 t36 t58 t24 t40
mid t1 t1 t63 t35 t31 t8 t19 t41
short t43 t13 t39
long t77 t63 t66 t53 t41 t59 t30 t62 t23 t54 t34
long t54 t10 t3 t50 t69 t54 t35 t21 t39 t20 t9 t51
mid t73 t28 t67 t55 t47 t64 t56 t62 t26
mid t31 t66 t39 t54 t47 t24 t9
long t45 t8 t7 t70 t9 t51 t43 t58 t20 t59 t42
short t12 t76 t65 t7 t54 t53
long t34 t9 t22 t18 t35 t23 t24 t28 t27 t77 t71 t72 t28 t56
mid t65 t0 t73 t25 t19 t20 t37 t74 t20 t5
short t23 t73 t55 t66 t48 t74
short t28 t58 t78 t24
long t63 t40 t41 t49 t72 t62 t67 t38 t8 t47 t5 t40 t8 t43 t24
long t5 t22 t51 t36 t32 t55 t14 t37 t21 t31 t22
long t76 t73 t21 t19 t77 t20 t16 t37 t14 t46 t4 t18 t39
short t22 t77 t40 t46
long t53 t0 t38 t9 t70 t38 t53 t32 t30 t34 t69 t79 t71 t54
long t38 t65 t7 t63 t31 t5 t16 t29 t65 t21 t44 t46 t54
short t0 t16 t65 t7 t63 t53
long t43 t76 t5 t27 t34 t28 t64 t69 t61 t24 t39
long t51 t52 t57 t48 t61 t26 t58 t54 t14 t11 t44 t43
mid t69 t28 t42 t8 t68 t69 t64
long t37 t76 t44 t50 t16 t69 t38 t3 t51 t38 t12
long t55 t71 t19 t61 t69 t20 t72 t0 t27 t21 t71 t16 t31 t71 t75
long t30 t77 t70 t40 t21 t6 t3 t23 t17 t20 t26 t19 t9 t79 t74
short t79 t57 t24 t18 t44 t67
mid t52 t3 t76 t73 t31 t20 t60 t76
long t35 t47 t12 t48 t56 t22 t24 t68 t0 t78 t42 t49 t53 t65
short t77 t53 t66 t11 t29
mid t32 t9 t20 t14 t62 t29 t51
long t9 t56 t9 t19 t70 t71 t46 t62 t31 t21 t40 t22 t61
mid t41 t15 t33 t66 t47 t70 t34 t19 t15 t2
short t65 t79 t36 t28
long t24 t20 t59 t72 t54 t79 t26 t6 t59 t61 t44 t12 t59
mid t75 t4 t58 t69 t76 t13 t59
mid t31 t72 t11 t56 t67 t74 t67 t45
short t23 t15 t48 t26
short t36 t63 t23 t14
mid t11 t29 t2 t52 t63 t64 t59
long t44 t35 t40 t68 t5 t23 t46 t5 t76 t7 t49 t8 t51 t11 t55
long t35 t39 t42 t17 t9 t17 t39 t23 t74 t18 t13 t8 t79 t4 t43
mid t68 t4 t22 t79 t41 t11 t25 t55
long t56 t62 t19 t69 t77 t71 t56 t74 t23 t56 t77
long t7 t44 t10 t78 t61 t54 t43 t43 t76 t46 t29 t64
short t36 t51 t25
short t37 t5 t18 t54
short t29 t57 t49 t1 t2
mid t60 t17 t76 t4 t47 t49 t31 t24
long t47 t13 t50 t42 t43 t49 t38 t48 t71 t72 t61 t39
long t78 t27 t29 t25 t30 t15 t19 t42 t27 t21 t4 t65
short t69 t74 t20 t39 t73 t32
long t36 t39 t74 t51 t60 t39 t62 t11 t26 t49 t3 t16
short t61 t62 t61 t49
long t6 t18 t28 t32 t52 t31 t52 t29 t14 t50 t57 t46 t61
long t30 t69 t8 t53 t1 t46 t34 t43 t34 t43 t62 t37 t15 t4
mid t37 t60 t54 t20 t5 t12 t51 t56 t8 t9
mid t68 t13 t76 t79 t37 t7 t52 t53 t8 t13
mid t6 t12 t12 t7 t3 t19 t68 t33 t15 t43
mid t52 t35 t10 t38 t40 t31 t3
long t70 t13 t61 t62 t16 t6 t9 t4 t66 t3 t7 t11 t49 t62
mid t18 t9 t48 t48 t73 t53 t7 t59 t25
mid t51 t63 t79 t69 t17 t55 t68
mid t14 t32 t74 t62 t33 t75 t42 t47
long t39 t17 t1 t50 t46 t19 t68 t1 t56 t69 t35 t60 t67
mid t77 t42 t56 t7 t32 t58 t35 t66 t23 t74
short t68 t28 t45
short t0 t6 t13
short t3 t76 t46 t14 t0
long t67 t34 t43 t75 t11 t39 t49 t22 t31 t29 t4 t23
short t0 t29 t18 t74 t15
long t18 t59 t71 t38 t40 t61 t23 t28 t61 t50 t17 t31 t37 t31 t62
long t25 t32 t22 t55 t0 t42 t72 t34 t29 t21 t55 t13
mid t61 t42 t38 t17 t5 t40 t13 t9 t30
mid t74 t11 t46 t42 t66 t1 t39 t71
short t58 t43 t29 t64
short t31 t26 t67 t25 t65
mid t21 t33 t57 t69 t68 t51 t41 t3 t29 t45
short t48 t39 t52
short t55 t11 t73
long t14 t78 t12 t63 t21 t5 t41 t53 t3 t17 t39 t33
long t22 t45 t17 t20 t51 t39 t77 t0 t52 t53 t16 t56 t21
short t55 t60 t47 t21 t2 t31
mid t52 t46 t46 t52 t78 t38 t56
short t1 t22 t17 t63 t5
short t32 t38 t74 t44 t75 t8
mid t77 t65 t76 t68 t46 t23 t79 t72 t30
long t16 t20 t55 t67 t45 t24 t45 t37 t70 t55 t16
short t39 t38 t16 t61 t40
mid t54 t45 t55 t43 t12 t60 t0 t22
short t36 t18 t28 t4 t77 t11
long t61 t6 t0 t73 t22 t38 t53 t54 t58 t42 t12
long t19 t15 t73 t63 t51 t15 t45 t24 t63 t76 t12 t33
short t60 t65 t43 t60
long t20 t12 t27 t12 t74 t39 t5 t63 t28 t58 t18 t30 t47
long t50 t12 t20 t17 t76 t69 t63 t48 t78 t60 t60 t43 t18 t44
long t74 t77 t33 t1 t60 t73 t49 t6 t35 t47 t34 t67
short t65 t55 t55
short t17 t36 t76
mid t69 t68 t73 t66 t17 t67 t21 t44
short t3 t32 t19 t71
long t0 t77 t25 t46 t32 t59 t73 t55 t38 t61 t65 t46 t2 t61
short t68 t42 t48 t22 t30 t34
long t3 t33 t36 t25 t69 t62 t70 t41 t66 t69 t72 t6 t4
mid t38 t64 t71 t24 t33 t8 t29
long t72 t52 t23 t36 t65 t63 t3 t76 t53 t45 t7
short t12 t36 t39
short t19 t42 t59 t72 t27 t41
mid t56 t70 t52 t15 t71 t69 t9 t23 t17
short t14 t37 t68 t6
long t33 t1 t2 t7 t9 t66 t39 t13 t5 t10 t17
short t58 t9 t8 t15 t20
short t27 t42 t39
short t11 t77 t33 t27 t76
long t5 t59 t41 t24 t64 t45 t35 t33 t18 t42 t77 t5 t38 t71
mid t65 t10 t15 t68 t71 t39 t39 t47 t47
mid t38 t42 t67 t23 t55 t54 t45
long t35 t42 t55 t34 t79 t20 t33 t66 t36 t27 t65 t43 t24
short t17 t75 t26 t64 t24
short t34 t21 t6 t34 t27
mid t16 t7 t14 t75 t10 t46 t28 t29
short t57 t58 t53
long t79 t42 t58 t1 t48 t58 t53 t65 t3 t69 t50 t51 t64 t25
short t77 t70 t64
short t60 t33 t8 t64 t21 t69
long t3 t5 t34 t38 t49 t1 t60 t64 t15 t38 t43 t55 t45
short t21 t33 t14
mid t25 t36 t27 t55 t74 t29 t38 t60 t69
short t60 t59 t4 t30
long t37 t50 t65 t12 t35 t79 t40 t18 t56 t31 t0 t45 t74 t24
short t63 t66 t56 t6 t45 t71
mid t6 t7 t69 t59 t23 t78 t59 t17 t30
short t46 t15 t8
short t11 t29 t36 t15
long t64 t49 t5 t3 t46 t7 t61 t78 t77 t73 t24
long t78 t36 t47 t36 t39 t36 t72 t39 t45 t76 t4 t69 t68 t76
long t1 t8 t26 t36 t30 t32 t77 t37 t51 t35 t70 t15 t30
long t36 t24 t18 t61 t63 t67 t10 t33 t65 t16 t70 t41 t58
mid t9 t45 t26 t9 t36 t57 t18 t26 t62 t26
long t74 t25 t15 t32 t7 t56 t26 t35 t16 t63 t74 t70 t68 t6
short t24 t32 t42 t0 t74 t43
mid t22 t5 t7 t73 t4 t32 t36 t6
short t3 t76 t13 t26 t67
short t65 t55 t55 t58 t9 t7
mid t7 t70 t60 t64 t44 t68 t8 t40
short t24 t19 t78
mid t49 t41 t30 t11 t21 t0 t48 t40
long t72 t2 t70 t58 t0 t15 t74 t6 t43 t32 t29 t22
long t40 t56 t51 t79 t3 t64 t58 t64 t44 t13 t75
long t42 t21 t39 t4 t31 t18 t8 t68 t24 t16 t12 t48 t11 t21 t5
mid t60 t44 t67 t7 t52 t21 t42 t18 t16 t47
short t14 t18 t52 t75
long t56 t43 t19 t36 t27 t79 t8 t29 t69 t58 t2 t44 t63 t67 t12
short t28 t68 t23 t54 t13
long t27 t5 t47 t41 t65 t68 t58 t68 t72 t37 t29 t47 t75 t8
long t56 t28 t31 t21 t33 t46 t53 t75 t74 t72 t27 t55 t41 t73
mid t43 t69 t21 t29 t42 t68 t30 t10 t76 t8
short t15 t22 t75 t25 t0 t11
mid t25 t28 t34 t11 t11 t19 t46 t54 t38
short t31 t60 t72
short t78 t23 t72 t20 t54 t40
long t66 t5 t11 t26 t22 t48 t45 t44 t15 t64 t0
long t25 t18 t63 t49 t57 t79 t40 t2 t39 t41 t37 t40
long t51 t39 t78 t57 t28 t57 t62 t34 t36 t15 t53 t5 t23 t40 t62
short t56 t70 t67 t62
long t42 t0 t60 t11 t50 t16 t57 t0 t4 t19 t72 t50 t33 t16 t13
long t37 t32 t6 t22 t28 t74 t42 t26 t64 t27 t42 t32 t1 t2
short t30 t3 t27
long t38 t41 t28 t75 t38 t54 t8 t11 t2 t56 t28 t22 t74 t49
long t33 t61 t68 t24 t61 t55 t40 t67 t7 t60 t29
long t23 t78 t22 t25 t63 t56 t16 t74 t54 t65 t54 t39 t18 t0
long t16 t34 t9 t13 t2 t79 t77 t51 t68 t6 t50 t11
mid t17 t27 t72 t38 t3 t53 t16
mid t30 t75 t28 t74 t38 t15 t49
mid t21 t25 t44 t71 t73 t68 t56 t59
long t63 t27 t77 t9 t15 t15 t51 t4 t79 t53 t39 t33 t62 t13
long t20 t46 t22 t49 t9 t73 t43 t54 t37 t3 t33 t66 t51
short t46 t2 t52 t72
mid t32 t5 t1 t67 t8 t45 t9
mid t19 t54 t28 t39 t59 t79 t27 t28
long t18 t13 t78 t24 t77 t47 t79 t14 t22 t47 t22 t4
short t51 t31 t26 t19 t69 t12
long t43 t43 t19 t66 t1 t46 t7 t69 t33 t60 t22 t41
short t7 t64 t72 t32 t77 t74
long t38 t70 t70 t42 t0 t13 t22 t50 t13 t27 t30 t26 t36 t58 t27
long t37 t10 t23 t53 t59 t17 t46 t31 t78 t21 t14 t36 t56 t19 t77
short t8 t38 t72 t72 t71
mid t43 t76 t1 t20 t33 t23 t58
long t76 t46 t12 t48 t5 t56 t26 t53 t79 t74 t71 t73 t51 t1
short t35 t40 t17 t66 t8
short t3 t62 t51 t72 t36 t37
mid t44 t45 t50 t11 t67 t75 t54 t26 t16 t2
mid t0 t74 t58 t51 t56 t44 t38 t14
short t78 t26 t64 t16
mid t21 t68 t55 t71 t68 t15 t3 t70 t28
long t12 t13 t16 t61 t53 t12 t68 t29 t48 t72 t51
mid t71 t11 t28 t74 t77 t63 t21 t16 t9
short t50 t63 t69 t75 t15
mid t16 t19 t79 t2 t46 t8 t44
mid t43 t11 t53 t72 t52 t2 t16 t45 t20 t35
long t21 t54 t6 t59 t30 t58 t16 t56 t40 t46 t23
long t35 t54 t15 t29 t17 t10 t60 t27 t14 t57 t10 t75 t47
short t9 t60 t72
mid t36 t40 t43 t63 t16 t63 t56
long t26 t15 t74 t64 t11 t37 t54 t50 t66 t76 t9 t22
mid t25 t21 t48 t68 t26 t5 t45
mid t76 t28 t16 t28 t62 t22 t73 t64
long t58 t39 t45 t31 t34 t50 t27 t54 t6 t57 t68 t13 t52 t40
mid t50 t49 t6 t61 t5 t74 t24
short t66 t1 t33 t34 t2 t18
mid t74 t79 t28 t6 t44 t9 t27 t7 t23
short t38 t24 t66 t65 t13 t79
long t8 t11 t66 t59 t56 t69 t4 t61 t17 t45 t71 t15 t24 t23 t46
long t51 t78 t75 t30 t25 t68 t10 t61 t48 t27 t63
short t60 t0 t19 t54
mid t51 t44 t79 t57 t70 t51 t65 t52 t5 t5
short t21 t47 t37
short t69 t26 t59 t76
mid t13 t39 t14 t12 t1 t71 t62 t29 t27 t36
short t17 t56 t72 t44 t41
short t12 t16 t35 t22 t22 t5
long t7 t42 t69 t11 t2 t28 t16 t3 t0 t2 t8 t18
long t50 t53 t59 t13 t76 t33 t59 t37 t2 t25 t43 t56 t62 t73 t53
mid t64 t32 t21 t6 t68 t47 t43 t71
long t58 t77 t32 t45 t73 t13 t28 t41 t3 t37 t27 t67 t43 t43 t65
mid t19 t2 t55 t52 t28 t38 t19 t31
short t75 t32 t10 t45
mid t52 t64 t71 t68 t38 t13 t41 t76 t53 t14
short t78 t19 t52 t74
mid t17 t35 t54 t28 t34 t30 t15 t9 t57 t53
short t24 t58 t42 t42 t24
short t59 t31 t8
short t25 t11 t31 t2 t7 t59
short t10 t7 t53 t47
short t39 t59 t36
long t79 t61 t71 t65 t61 t26 t53 t15 t20 t75 t12
long t78 t35 t8 t54 t63 t59 t65 t25 t25 t49 t49
short t13 t55 t23
short t35 t63 t78 t22 t5
long t21 t32 t24 t21 t60 t5 t50 t4 t50 t49 t24
mid t45 t73 t38 t62 t70 t64 t46 t50 t5
mid t28 t26 t11 t60 t57 t33 t63 t45
mid t68 t45 t75 t77 t33 t43 t11 t29 t24
short t16 t17 t46 t48 t22
mid t68 t16 t29 t6 t12 t2 t29 t78
short t39 t68 t43
long t67 t67 t41 t7 t74 t16 t58 t49 t59 t4 t53 t55 t21 t21
mid t62 t52 t0 t55 t24 t59 t48 t21
mid t47 t47 t70 t40 t53 t58 t15 t38 t50 t2
long t73 t49 t71 t28 t58 t66 t9 t22 t39 t49 t49 t26 t43
mid t43 t14 t15 t9 t36 t8 t21 t44 t6 t45
long t56 t27 t49 t37 t57 t78 t57 t28 t22 t22 t52 t21 t47 t64 t2
long t39 t17 t23 t36 t30 t6 t60 t44 t46 t10 t9 t30
mid t76 t8 t16 t50 t50 t29 t5 t79 t78 t75
short t74 t35 t57 t4 t30 t56
long t16 t28 t76 t20 t0 t17 t74 t36 t27 t28 t71 t3
long t45 t3 t39 t63 t45 t16 t50 t31 t13 t61 t13 t23 t62 t69 t58
mid t47 t48 t47 t36 t62 t48 t44 t63 t61
long t31 t19 t62 t78 t11 t13 t1 t23 t26 t9 t35 t43 t34
