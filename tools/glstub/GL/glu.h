#ifndef __glu_stub_h__
#define __glu_stub_h__
#include <GL/gl.h>
#ifdef __cplusplus
extern "C" {
#endif
typedef struct GLUquadric GLUquadric;
typedef GLUquadric GLUquadricObj;
static inline GLUquadric* gluNewQuadric(void){return 0;}
static inline void gluDeleteQuadric(GLUquadric*q){(void)q;}
static inline void gluSphere(GLUquadric*q,GLdouble r,GLint sl,GLint st){(void)q;(void)r;(void)sl;(void)st;}
static inline void gluCylinder(GLUquadric*q,GLdouble b,GLdouble t,GLdouble h,GLint sl,GLint st){(void)q;(void)b;(void)t;(void)h;(void)sl;(void)st;}
static inline void gluDisk(GLUquadric*q,GLdouble i,GLdouble o,GLint sl,GLint lo){(void)q;(void)i;(void)o;(void)sl;(void)lo;}
static inline void gluQuadricTexture(GLUquadric*q,GLboolean b){(void)q;(void)b;}
static inline void gluQuadricNormals(GLUquadric*q,GLenum e){(void)q;(void)e;}
static inline void gluOrtho2D(GLdouble a,GLdouble b,GLdouble c,GLdouble d){(void)a;(void)b;(void)c;(void)d;}
static inline void gluPerspective(GLdouble a,GLdouble b,GLdouble c,GLdouble d){(void)a;(void)b;(void)c;(void)d;}
static inline void gluLookAt(GLdouble a,GLdouble b,GLdouble c,GLdouble d,GLdouble e,GLdouble f,GLdouble g,GLdouble h,GLdouble i){(void)a;(void)b;(void)c;(void)d;(void)e;(void)f;(void)g;(void)h;(void)i;}
static inline GLint gluBuild2DMipmaps(GLenum a,GLint b,GLsizei c,GLsizei d,GLenum e,GLenum f,const void*g){(void)a;(void)b;(void)c;(void)d;(void)e;(void)f;(void)g;return 0;}
static inline void gluQuadricDrawStyle(GLUquadric*q,GLenum s){(void)q;(void)s;}
static inline void gluQuadricOrientation(GLUquadric*q,GLenum o){(void)q;(void)o;}
#define GLU_FILL 100012
#define GLU_POINT 100010
#define GLU_LINE 100011
#define GLU_SILHOUETTE 100013
#define GLU_INSIDE 100021
#define GLU_OUTSIDE 100020
#define GLU_SMOOTH 100000
#define GLU_FLAT 100001
#define GLU_NONE 100002
#ifdef __cplusplus
}
#endif
#endif
